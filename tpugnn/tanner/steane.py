"""Steane code [[7,1,3]]: the distance-3 triangular color code.

Self-dual CSS code built from the Hamming(7,4) parity-check matrix (the
same supports serve as X- and Z-type stabilizers).  Included both as a
fourth decodable family and as the canonical demonstration that the whole
stack (graph build, logical derivation, decoder, eval) is generic over any
CSS pair via :func:`tpugnn.tanner.build_tanner_graph` — nothing in the
pipeline is specialized to surface/toric layouts.

Note: qubits touch up to three same-type checks, so the union-find baseline
(which requires a matchable, degree <= 2 decoding graph) rejects this code;
the GNN decoder handles it unchanged.
"""

from __future__ import annotations

import numpy as np

from tpugnn.tanner.graph import TannerGraph, build_tanner_graph

__all__ = ["steane_code_checks", "build_steane_code"]


def steane_code_checks(d: int = 3) -> tuple[np.ndarray, np.ndarray]:
    if d != 3:
        raise ValueError("the Steane family is the d=3 triangular color code")
    h = np.array(
        [
            [1, 1, 1, 0, 1, 0, 0],
            [1, 1, 0, 1, 0, 1, 0],
            [1, 0, 1, 1, 0, 0, 1],
        ],
        np.uint8,
    )
    return h.copy(), h.copy()


def build_steane_code(d: int = 3, *, pad_nodes: int = 8, pad_edges: int = 128) -> TannerGraph:
    hx, hz = steane_code_checks(d)
    g = build_tanner_graph(hx, hz, name="steane", pad_nodes=pad_nodes, pad_edges=pad_edges)
    assert g.k == 1
    return g
