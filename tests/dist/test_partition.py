"""Edge-partitioner invariants (SURVEY.md §4.4)."""

import numpy as np
import pytest

from tpugnn.dist import build_partitioned_code, partition_graph
from tpugnn.tanner import build_code


@pytest.mark.parametrize("family,d,P", [("surface", 5, 4), ("toric", 3, 2), ("surface", 3, 8)])
def test_every_edge_assigned_exactly_once_per_direction(family, d, P):
    graph, pg = build_partitioned_code(family, d, P)
    # reconstruct global (check, qubit) pairs from both directions
    ref = set(
        zip(np.asarray(graph.edge_check)[: graph.n_edges].tolist(),
            np.asarray(graph.edge_qubit)[: graph.n_edges].tolist())
    )
    got_c = []
    for p in range(P):
        mask = np.asarray(pg.c_mask[p]) > 0
        cs = np.asarray(pg.c_dst[p])[mask] + p * pg.mb
        qs = np.asarray(pg.c_src[p])[mask]
        got_c += list(zip(cs.tolist(), qs.tolist()))
    assert len(got_c) == graph.n_edges and set(got_c) == ref
    got_q = []
    for p in range(P):
        mask = np.asarray(pg.q_mask[p]) > 0
        qs = np.asarray(pg.q_dst[p])[mask] + p * pg.nb
        cs = np.asarray(pg.q_src[p])[mask]
        got_q += list(zip(cs.tolist(), qs.tolist()))
    assert len(got_q) == graph.n_edges and set(got_q) == ref


def test_ownership_is_contiguous_blocks():
    graph, pg = build_partitioned_code("surface", 5, 4)
    # local dst indices stay within the local block
    assert int(np.max(np.asarray(pg.c_dst))) < pg.mb
    assert int(np.max(np.asarray(pg.q_dst))) < pg.nb
    # masks reassemble the global masks
    np.testing.assert_array_equal(
        np.asarray(pg.check_mask).reshape(-1), np.asarray(graph.check_mask)
    )
    np.testing.assert_array_equal(
        np.asarray(pg.qubit_mask).reshape(-1), np.asarray(graph.qubit_mask)
    )


def test_indivisible_padding_rejected():
    g = build_code("surface", 3, pad_nodes=8)  # 8 % 3 != 0 blocks
    with pytest.raises(ValueError, match="divide"):
        partition_graph(g, 3)
