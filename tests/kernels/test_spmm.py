"""Pallas ELL-SpMM kernel vs oracle + XLA paths (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle.mp_oracle import scatter_agg_oracle
from tpugnn.kernels.spmm import ell_aggregate, slot_incidence
from tpugnn.mp import aggregate_to_checks, aggregate_to_qubits
from tpugnn.tanner import build_code


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 3)])
def test_pallas_matches_oracle(family, d):
    g = build_code(family, d)
    msg = jax.random.normal(jax.random.PRNGKey(0), (8, g.n_edges_pad, 128))
    got = ell_aggregate(msg, g.ell_check_edge, g.ell_check_mask)
    ref = scatter_agg_oracle(
        np.asarray(msg), np.asarray(g.edge_check), np.asarray(g.edge_mask),
        g.n_checks_pad, "sum",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_pallas_backend_through_mp():
    g = build_code("surface", 3)
    msg = jax.random.normal(jax.random.PRNGKey(1), (4, g.n_edges_pad, 128))
    a = aggregate_to_checks(g, msg, backend="pallas", agg="sum")
    b = aggregate_to_checks(g, msg, backend="segment", agg="sum")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    aq = aggregate_to_qubits(g, msg, backend="pallas", agg="mean")
    bq = aggregate_to_qubits(g, msg, backend="segment", agg="mean")
    np.testing.assert_allclose(np.asarray(aq), np.asarray(bq), atol=1e-4)


def test_incidence_operator():
    g = build_code("repetition", 5)
    s = np.asarray(slot_incidence(g.ell_check_edge, g.ell_check_mask, g.n_edges_pad))
    # row sums equal real degrees; padded edge column is empty
    deg = np.zeros(g.n_checks_pad)
    ec = np.asarray(g.edge_check)[: g.n_edges]
    for c in ec:
        deg[c] += 1
    np.testing.assert_array_equal(s.sum(1), deg)
    assert s[:, g.n_edges :].sum() == 0


def test_odd_batch_sizes():
    g = build_code("surface", 3)
    for b in (1, 3, 8, 16):
        msg = jax.random.normal(jax.random.PRNGKey(b), (b, g.n_edges_pad, 128))
        got = ell_aggregate(msg, g.ell_qubit_edge, g.ell_qubit_mask)
        ref = scatter_agg_oracle(
            np.asarray(msg), np.asarray(g.edge_qubit), np.asarray(g.edge_mask),
            g.n_qubits_pad, "sum",
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


@pytest.mark.parametrize("family,d", [("surface", 3), ("toric", 3)])
def test_pallas_max_matches_oracle(family, d):
    g = build_code(family, d)
    msg = jax.random.normal(jax.random.PRNGKey(2), (8, g.n_edges_pad, 128))
    got = ell_aggregate(msg, g.ell_check_edge, g.ell_check_mask, agg="max")
    ref = scatter_agg_oracle(
        np.asarray(msg), np.asarray(g.edge_check), np.asarray(g.edge_mask),
        g.n_checks_pad, "max",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_pallas_max_through_mp_all_negative():
    # rows whose every message is negative must keep their true (negative)
    # max; only empty rows are zeroed
    g = build_code("surface", 3)
    msg = -jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (4, g.n_edges_pad, 128))) - 0.5
    a = aggregate_to_checks(g, msg, backend="pallas", agg="max")
    b = aggregate_to_checks(g, msg, backend="segment", agg="max")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    aq = aggregate_to_qubits(g, msg, backend="pallas", agg="max")
    bq = aggregate_to_qubits(g, msg, backend="ell", agg="max")
    np.testing.assert_allclose(np.asarray(aq), np.asarray(bq), atol=1e-5)
