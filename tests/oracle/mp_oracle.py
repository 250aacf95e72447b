"""Deliberately-naive NumPy oracle for Tanner-graph message passing.

Implements the reference semantics — gather endpoints per edge, per-edge
message, explicit Python scatter loop into destination rows, node update —
with no vectorization tricks.  Every tpugnn backend (segment / dense /
pallas) must match this bit of code to f32 tolerance (SURVEY.md §4.1: the
reference mount was empty, so this oracle replaces "allclose vs reference
activations" as the parity target).
"""

from __future__ import annotations

import numpy as np


def gather_oracle(edge_check, edge_qubit, edge_mask, x_check, x_qubit):
    """Per-edge endpoint features, zeroed on padded edges.

    x_check: [B, m, F], x_qubit: [B, n, F] -> ([B, E, F], [B, E, F])
    """
    B, E = x_check.shape[0], len(edge_check)
    F = x_check.shape[-1]
    xc = np.zeros((B, E, F), np.float64)
    xq = np.zeros((B, E, F), np.float64)
    for b in range(B):
        for e in range(E):
            if edge_mask[e] > 0:
                xc[b, e] = x_check[b, edge_check[e]]
                xq[b, e] = x_qubit[b, edge_qubit[e]]
    return xc, xq


def scatter_agg_oracle(msg, dst, mask, num_rows, agg="sum"):
    """Explicit scatter-aggregate loop: msg [B, E, F] -> [B, num_rows, F]."""
    B, E, F = msg.shape
    if agg in ("sum", "mean"):
        out = np.zeros((B, num_rows, F), np.float64)
        cnt = np.zeros(num_rows, np.int64)
        for e in range(E):
            if mask[e] > 0:
                out[:, dst[e]] += msg[:, e]
                cnt[dst[e]] += 1
        if agg == "mean":
            out /= np.maximum(cnt, 1)[None, :, None]
        return out
    if agg == "max":
        out = np.full((B, num_rows, F), -np.inf)
        for e in range(E):
            if mask[e] > 0:
                out[:, dst[e]] = np.maximum(out[:, dst[e]], msg[:, e])
        out[np.isneginf(out)] = 0.0
        return out
    raise ValueError(agg)
