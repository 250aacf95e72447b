"""Exact MWPM baseline: blossom core, decoder validity, optimality, LER.

Covers the reference's canonical MWPM comparison [SURVEY.md §2.1 C6]:
  * native O(V^3) blossom vs a brute-force bitmask oracle on random graphs;
  * native decode vs the networkx fallback on identical instances;
  * every correction reproduces the observed syndrome (all code families);
  * matching optimality: MWPM correction weight <= union-find's;
  * LER sanity: exact matching is at least as good as union-find at d=3.
"""

from functools import lru_cache

import jax
import numpy as np
import pytest

from tpugnn.baselines import MWPMDecoder, MWPMSectorDecoder, UnionFindDecoder
from tpugnn.eval.baseline import ler_mwpm, ler_union_find
from tpugnn.sampling import sample_batch, syndrome
from tpugnn.tanner import build_code
from tpugnn.utils.native import available, load


def _brute_max_matching(w: np.ndarray) -> int:
    """Max-weight matching by bitmask DP (exact oracle, n <= ~14)."""
    n = w.shape[0]

    @lru_cache(maxsize=None)
    def rec(mask: int) -> int:
        if mask == 0:
            return 0
        i = (mask & -mask).bit_length() - 1
        rest = mask & ~(1 << i)
        best = rec(rest)  # leave i unmatched
        mm = rest
        while mm:
            j = (mm & -mm).bit_length() - 1
            mm &= mm - 1
            if w[i, j] > 0:
                best = max(best, int(w[i, j]) + rec(rest & ~(1 << j)))
        return best

    return rec((1 << n) - 1)


@pytest.mark.skipif(not available(), reason="native library not built")
def test_blossom_matches_bruteforce():
    lib = load()
    rng = np.random.default_rng(7)
    for trial in range(120):
        n = int(rng.integers(1, 12))
        w = np.zeros((n, n), np.int64)
        dens = rng.uniform(0.3, 1.0)
        for i in range(n):
            for j in range(i + 1, n):
                if rng.uniform() < dens:
                    w[i, j] = w[j, i] = int(rng.integers(1, 1000))
        mate = np.zeros(n, np.int32)
        tot = lib.mwpm_match(np.ascontiguousarray(w.ravel()), n, mate)
        matched = 0
        for i in range(n):
            if mate[i] >= 0:
                assert mate[mate[i]] == i
                if mate[i] > i:
                    assert w[i, mate[i]] > 0
                    matched += int(w[i, mate[i]])
        assert matched == tot
        assert tot == _brute_max_matching(w), f"trial {trial}"


@pytest.mark.parametrize(
    "family,d", [("surface", 3), ("surface", 5), ("toric", 3), ("repetition", 7)]
)
def test_mwpm_reproduces_syndrome(family, d):
    """An MWPM correction always reproduces the observed syndrome."""
    import jax.numpy as jnp

    g = build_code(family, d)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.1, 128)
    dec = MWPMDecoder(g)
    ex_hat, ez_hat = dec.decode(np.asarray(b.syndrome))
    exp = jnp.zeros((128, g.n_qubits_pad)).at[:, : g.n_qubits].set(ex_hat)
    ezp = jnp.zeros((128, g.n_qubits_pad)).at[:, : g.n_qubits].set(ez_hat)
    s_hat = syndrome(g, exp, ezp)
    np.testing.assert_array_equal(np.asarray(s_hat), np.asarray(b.syndrome))


@pytest.mark.skipif(not available(), reason="native library not built")
@pytest.mark.parametrize("family,d", [("surface", 5), ("toric", 3)])
def test_native_matches_networkx(family, d):
    """Native decode and the networkx fallback find equal-weight matchings."""
    pytest.importorskip("networkx")
    g = build_code(family, d)
    b = sample_batch(jax.random.PRNGKey(3), g, 0.12, 64)
    dn = MWPMDecoder(g)
    dp = MWPMDecoder(g, force_python=True)
    s = np.asarray(b.syndrome)
    nx_, nz_ = dn.decode(s)
    px, pz = dp.decode(s)
    # Degenerate optima may differ as edge sets but never in total weight.
    np.testing.assert_array_equal(nx_.sum(axis=1), px.sum(axis=1))
    np.testing.assert_array_equal(nz_.sum(axis=1), pz.sum(axis=1))


def test_mwpm_never_heavier_than_union_find():
    """Exact matching never uses more (unit-weight) edges than union-find."""
    g = build_code("surface", 5)
    b = sample_batch(jax.random.PRNGKey(11), g, 0.08, 256)
    s = np.asarray(b.syndrome)
    mx, mz = MWPMDecoder(g).decode(s)
    ux, uz = UnionFindDecoder(g).decode(s)
    assert np.all(mx.sum(axis=1) <= ux.sum(axis=1))
    assert np.all(mz.sum(axis=1) <= uz.sum(axis=1))


def test_sector_decoder_weighted_paths():
    """Non-uniform edge weights reroute the geodesic (3-vertex path graph)."""
    # vertices 0-1-2 in a line, plus a direct heavy edge 0-2
    eu = np.array([0, 1, 0], np.int32)
    ev = np.array([1, 2, 2], np.int32)
    # cheap direct edge: defects {0,2} must use edge 2
    dec = MWPMSectorDecoder(eu, ev, 3, weights=np.array([1.0, 1.0, 1.5]))
    cor = dec.decode(np.array([[1, 0, 1]], np.uint8))
    np.testing.assert_array_equal(cor[0], [0, 0, 1])
    # expensive direct edge: defects {0,2} must take the two-hop path
    dec = MWPMSectorDecoder(eu, ev, 3, weights=np.array([1.0, 1.0, 2.5]))
    cor = dec.decode(np.array([[1, 0, 1]], np.uint8))
    np.testing.assert_array_equal(cor[0], [1, 1, 0])


def test_mwpm_perfect_at_zero_noise_and_ler_sanity():
    g = build_code("surface", 3)
    ev0 = ler_mwpm(g, p=0.0, shots=256, batch=256)
    assert ev0["ler"] == 0.0
    mw = ler_mwpm(g, p=0.05, shots=8192, batch=4096, key=jax.random.PRNGKey(5))
    uf = ler_union_find(g, p=0.05, shots=8192, batch=4096,
                        key=jax.random.PRNGKey(5))
    assert mw["syn_mismatch_rate"] == 0.0
    # identical sample stream: exact matching should not lose to union-find
    # beyond Monte-Carlo noise
    assert mw["ler"] <= uf["ler"] + 3 * uf["ler_stderr"]


def test_weighted_mwpm_on_spacetime_graph():
    """Detector graphs with distinct data/measurement rates decode through
    log-likelihood weights; corrections stay syndrome-valid."""
    import jax.numpy as jnp

    from tpugnn.baselines.mwpm import _llr_weights
    from tpugnn.tanner.spacetime import build_spacetime_code

    g = build_spacetime_code("repetition", 5, 4, meas_ratio=2.0)
    w = _llr_weights(g, 0.03)
    assert w is not None and w.min() > 0
    assert len(np.unique(np.round(w, 9))) > 1  # genuinely non-uniform
    b = sample_batch(jax.random.PRNGKey(2), g, 0.05, 64)
    dec = MWPMDecoder(g, p=0.05)
    ex_hat, ez_hat = dec.decode(np.asarray(b.syndrome))
    exp = jnp.zeros((64, g.n_qubits_pad)).at[:, : g.n_qubits].set(ex_hat)
    ezp = jnp.zeros((64, g.n_qubits_pad)).at[:, : g.n_qubits].set(ez_hat)
    s_hat = syndrome(g, exp, ezp)
    np.testing.assert_array_equal(np.asarray(s_hat), np.asarray(b.syndrome))
