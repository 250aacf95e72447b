"""Toric code: periodic-boundary CSS code of distance d on a d x d torus.

2*d^2 data qubits sit on the edges of a periodic square lattice (d^2
horizontal + d^2 vertical).  d^2 vertex (X-type) stabilizers touch the four
edges incident to a vertex; d^2 plaquette (Z-type) stabilizers touch the four
edges around a face.  One stabilizer of each type is redundant (product of all
= identity), giving k = 2 logical qubits.

Reference provenance: BASELINE.json configs[3] names the "toric code variant
with periodic-boundary Tanner graph" as a required configuration
[SURVEY.md §2.1 C1; reference mount empty — SURVEY.md §0].
"""

from __future__ import annotations

import numpy as np

from tpugnn.tanner.graph import TannerGraph, build_tanner_graph

__all__ = ["toric_code_checks", "build_toric_code"]


def toric_code_checks(d: int) -> tuple[np.ndarray, np.ndarray]:
    """Parity-check matrices (hx, hz) of the d x d toric code.

    Qubit indexing: horizontal edge at (r, c) -> r*d + c; vertical edge at
    (r, c) -> d*d + r*d + c  (all coordinates mod d).
    """
    if d < 2:
        raise ValueError("toric code needs d >= 2")
    n = 2 * d * d

    def hq(r: int, c: int) -> int:
        return (r % d) * d + (c % d)

    def vq(r: int, c: int) -> int:
        return d * d + (r % d) * d + (c % d)

    hx = np.zeros((d * d, n), np.uint8)  # vertex stabilizers
    hz = np.zeros((d * d, n), np.uint8)  # plaquette stabilizers
    for r in range(d):
        for c in range(d):
            v = r * d + c
            # vertex (r, c): horizontal edges left/right, vertical up/down
            hx[v, hq(r, c)] ^= 1
            hx[v, hq(r, c - 1)] ^= 1
            hx[v, vq(r, c)] ^= 1
            hx[v, vq(r - 1, c)] ^= 1
            # plaquette with corner at vertex (r, c)
            hz[v, hq(r, c)] ^= 1
            hz[v, hq(r + 1, c)] ^= 1
            hz[v, vq(r, c)] ^= 1
            hz[v, vq(r, c + 1)] ^= 1
    assert not ((hx @ hz.T) % 2).any()
    return hx, hz


def build_toric_code(
    d: int, *, pad_nodes: int = 8, pad_edges: int = 128
) -> TannerGraph:
    hx, hz = toric_code_checks(d)
    g = build_tanner_graph(
        hx, hz, name=f"toric_d{d}", pad_nodes=pad_nodes, pad_edges=pad_edges
    )
    assert g.k == 2, f"toric code must encode k=2, got {g.k}"
    return g
