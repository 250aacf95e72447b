"""Tanner-graph construction: structure, padding, CSS + logical invariants."""

import numpy as np
import pytest

from tpugnn.tanner import (
    build_code,
    repetition_code_checks,
    surface_code_checks,
    toric_code_checks,
)
from tpugnn.utils import f2


@pytest.mark.parametrize("d", [2, 3, 5, 7, 9, 11])
def test_surface_counts(d):
    hx, hz = surface_code_checks(d)
    assert hx.shape == ((d * d - 1) // 2, d * d) or d % 2 == 0
    assert hx.shape[0] + hz.shape[0] == d * d - 1
    # every data qubit is touched by at least one stabilizer
    h = np.vstack([hx, hz])
    assert (h.sum(0) >= 1).all()
    # stabilizer weights are 2 or 4
    w = h.sum(1)
    assert set(np.unique(w)) <= {2, 4}
    assert not ((hx @ hz.T) % 2).any()


@pytest.mark.parametrize("d", [2, 3, 5])
def test_toric_counts(d):
    hx, hz = toric_code_checks(d)
    assert hx.shape == (d * d, 2 * d * d)
    assert hz.shape == (d * d, 2 * d * d)
    assert (hx.sum(1) == 4).all() and (hz.sum(1) == 4).all()
    # one redundancy each: rank d^2 - 1
    assert f2.rank(hx) == d * d - 1
    assert f2.rank(hz) == d * d - 1


@pytest.mark.parametrize(
    "family,d,k", [("surface", 3, 1), ("surface", 5, 1), ("toric", 3, 2), ("repetition", 7, 1)]
)
def test_logicals(family, d, k):
    g = build_code(family, d)
    assert g.k == k
    lx = np.asarray(g.logicals_x)[:, : g.n_qubits]
    lz = np.asarray(g.logicals_z)[:, : g.n_qubits]
    # canonical symplectic pairing
    assert np.array_equal((lx @ lz.T) % 2, np.eye(k))
    # logicals commute with all stabilizers
    hx_rows = np.asarray(g.h_syn_ez)[: g.n_checks, : g.n_qubits]  # X-type rows
    hz_rows = np.asarray(g.h_syn_ex)[: g.n_checks, : g.n_qubits]  # Z-type rows
    assert not ((lx @ hz_rows.T) % 2).any()  # X logicals vs Z stabilizers
    assert not ((lz @ hx_rows.T) % 2).any()


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 3)])
def test_minimum_distance_small(family, d):
    """Brute-force check that no logical operator has weight < d."""
    g = build_code(family, d)
    hx_rows = np.asarray(g.h_syn_ez)[: g.n_checks, : g.n_qubits]
    hx = hx_rows[hx_rows.sum(1) > 0]
    hz_rows = np.asarray(g.h_syn_ex)[: g.n_checks, : g.n_qubits]
    hz = hz_rows[hz_rows.sum(1) > 0]
    n = g.n_qubits
    # X errors of weight < d must not be undetected-but-logical
    from itertools import combinations

    for w in range(1, d):
        for qs in combinations(range(n), w):
            e = np.zeros(n, np.uint8)
            e[list(qs)] = 1
            if not ((hz @ e) % 2).any():  # undetected X error
                assert f2.in_rowspace(e, hx), f"weight-{w} X logical found"


@pytest.mark.parametrize("family,d", [("surface", 3), ("toric", 3), ("repetition", 5)])
def test_padding_structure(family, d):
    g = build_code(family, d)
    ec = np.asarray(g.edge_check)
    eq = np.asarray(g.edge_qubit)
    em = np.asarray(g.edge_mask)
    assert em.sum() == g.n_edges
    # real edges sorted by (check, qubit); padded edges point at dump rows
    real_c, real_q = ec[: g.n_edges], eq[: g.n_edges]
    order = np.lexsort((real_q, real_c))
    assert (order == np.arange(g.n_edges)).all()
    assert (ec[g.n_edges :] == g.n_checks_pad - 1).all()
    assert (eq[g.n_edges :] == g.n_qubits_pad - 1).all()
    assert g.n_checks_pad > g.n_checks and g.n_qubits_pad > g.n_qubits
    # rowptrs consistent
    rp = np.asarray(g.check_rowptr)
    assert rp[0] == 0 and rp[-1] == g.n_edges_pad
    assert (np.diff(rp) >= 0).all()
    qrp = np.asarray(g.qubit_rowptr)
    assert qrp[0] == 0 and qrp[-1] == g.n_edges_pad
    # qubit_perm is a permutation ordering edges by qubit
    qp = np.asarray(g.qubit_perm)
    assert sorted(qp.tolist()) == list(range(g.n_edges_pad))
    assert (np.diff(eq[qp]) >= 0).all()


def test_pure_error_tables():
    g = build_code("surface", 5)
    import jax, jax.numpy as jnp
    from tpugnn.sampling import sample_batch, syndrome

    b = sample_batch(jax.random.PRNGKey(0), g, 0.1, 32)
    s = b.syndrome
    ex0 = jnp.mod(s @ g.pure_ex.T, 2.0)
    ez0 = jnp.mod(s @ g.pure_ez.T, 2.0)
    assert bool(jnp.all(syndrome(g, ex0, ez0) == s))


def test_steane_code():
    """[[7,1,3]]: generic-CSS path handles a non-lattice color code."""
    g = build_code("steane", 3)
    assert (g.n_checks, g.n_qubits, g.k) == (6, 7, 1)
    lx = np.asarray(g.logicals_x)[:, :7]
    lz = np.asarray(g.logicals_z)[:, :7]
    assert lx.sum() >= 3 and lz.sum() >= 3  # distance 3
    # brute force: no weight<3 logical
    from itertools import combinations

    hx_rows = np.asarray(g.h_syn_ez)[: g.n_checks, :7]
    hx = hx_rows[hx_rows.sum(1) > 0]
    hz_rows = np.asarray(g.h_syn_ex)[: g.n_checks, :7]
    hz = hz_rows[hz_rows.sum(1) > 0]
    for w in (1, 2):
        for qs in combinations(range(7), w):
            e = np.zeros(7, np.uint8)
            e[list(qs)] = 1
            if not ((hz @ e) % 2).any():
                assert f2.in_rowspace(e, hx)


def test_steane_decodes():
    """The decoder stack runs unchanged on the Steane code."""
    import jax
    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
    from tpugnn.train import train

    cfg = ExperimentConfig(
        code=CodeConfig(family="steane", distance=3, p=0.05),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=3),
        train=TrainConfig(batch=64, steps=40, warmup_steps=8, eval_every=40,
                          eval_shots=256),
    )
    state, model, graph, hist = train(cfg, log=lambda *_: None)
    assert np.isfinite(hist[-1]["loss"])


def test_union_find_rejects_steane():
    import pytest as _pytest
    from tpugnn.baselines import UnionFindDecoder

    g = build_code("steane", 3)
    with _pytest.raises(ValueError, match="matchable"):
        UnionFindDecoder(g)
