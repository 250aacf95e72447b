"""Rotated surface code: open-boundary planar CSS code of distance d.

Layout: d*d data qubits on an integer grid (r, c), 0 <= r, c < d.  Stabilizer
plaquettes live on the dual half-integer grid, checkerboard-colored; weight-2
stabilizers close the top/bottom boundary (X-type) and left/right boundary
(Z-type).  Total stabilizers: d^2 - 1 (= (d^2-1)/2 each of X and Z), encoding
k = 1 logical qubit.

Reference provenance: the upstream repo constructs the equivalent open-boundary
surface-code Tanner graph host-side [SURVEY.md §2.1 C1 / BASELINE.json
configs[0..2]; the reference mount was empty — SURVEY.md §0 — so the exact
layout convention is ours, validated by the physics tests in
tests/physics/ (stabilizer commutation, k=1, distance, threshold ordering)].
"""

from __future__ import annotations

import numpy as np

from tpugnn.tanner.graph import TannerGraph, build_tanner_graph

__all__ = ["surface_code_checks", "build_surface_code"]


def surface_code_checks(d: int) -> tuple[np.ndarray, np.ndarray]:
    """Parity-check matrices (hx, hz) of the rotated surface code."""
    if d < 2:
        raise ValueError("surface code needs d >= 2")
    n = d * d

    def qid(r: int, c: int) -> int:
        return r * d + c

    hx_rows: list[np.ndarray] = []
    hz_rows: list[np.ndarray] = []
    # Plaquette (i, j) covers data qubits (i-1..i) x (j-1..j), for i, j in 0..d
    for i in range(d + 1):
        for j in range(d + 1):
            qs = [
                qid(r, c)
                for r in (i - 1, i)
                for c in (j - 1, j)
                if 0 <= r < d and 0 <= c < d
            ]
            if len(qs) < 2:
                continue  # corners
            is_x = (i + j) % 2 == 0
            if len(qs) == 2:
                # boundary: top/bottom keep X-type only; left/right keep Z-type
                on_tb = i == 0 or i == d
                if on_tb and not is_x:
                    continue
                if not on_tb and is_x:
                    continue
            row = np.zeros(n, np.uint8)
            row[qs] = 1
            (hx_rows if is_x else hz_rows).append(row)

    hx = np.array(hx_rows, np.uint8)
    hz = np.array(hz_rows, np.uint8)
    assert hx.shape[0] + hz.shape[0] == n - 1, (
        f"d={d}: got {hx.shape[0]}+{hz.shape[0]} stabilizers, want {n - 1}"
    )
    assert not ((hx @ hz.T) % 2).any()
    return hx, hz


def build_surface_code(
    d: int, *, pad_nodes: int = 8, pad_edges: int = 128
) -> TannerGraph:
    hx, hz = surface_code_checks(d)
    g = build_tanner_graph(
        hx, hz, name=f"surface_d{d}", pad_nodes=pad_nodes, pad_edges=pad_edges
    )
    assert g.k == 1, f"surface code must encode k=1, got {g.k}"
    return g
