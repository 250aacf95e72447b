"""Union-find baseline decoder + native GF(2) library."""

import jax
import numpy as np
import pytest

from tpugnn.baselines import UnionFindDecoder, uf_decode_py
from tpugnn.eval.baseline import ler_union_find
from tpugnn.sampling import sample_batch, syndrome
from tpugnn.tanner import build_code
from tpugnn.utils import f2
from tpugnn.utils.native import available


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 3), ("repetition", 7)])
def test_uf_reproduces_syndrome(family, d):
    """A union-find correction always reproduces the observed syndrome."""
    g = build_code(family, d)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.1, 128)
    dec = UnionFindDecoder(g)
    ex_hat, ez_hat = dec.decode(np.asarray(b.syndrome))
    import jax.numpy as jnp

    exp = jnp.zeros((128, g.n_qubits_pad))
    exp = exp.at[:, : g.n_qubits].set(ex_hat)
    ezp = jnp.zeros((128, g.n_qubits_pad))
    ezp = ezp.at[:, : g.n_qubits].set(ez_hat)
    s_hat = syndrome(g, exp, ezp)
    np.testing.assert_array_equal(np.asarray(s_hat), np.asarray(b.syndrome))


@pytest.mark.skipif(not available(), reason="native library not built")
def test_native_matches_python_uf():
    g = build_code("surface", 5)
    b = sample_batch(jax.random.PRNGKey(3), g, 0.12, 64)
    dn = UnionFindDecoder(g)
    dp = UnionFindDecoder(g, force_python=True)
    s = np.asarray(b.syndrome)
    nx, nz = dn.decode(s)
    px, pz = dp.decode(s)
    np.testing.assert_array_equal(nx, px)
    np.testing.assert_array_equal(nz, pz)


def test_uf_ler_below_threshold_ordering():
    """Below threshold, larger distance -> lower LER for union-find."""
    l3 = ler_union_find(build_code("surface", 3), p=0.02, shots=4096,
                        batch=2048, key=jax.random.PRNGKey(1))
    l5 = ler_union_find(build_code("surface", 5), p=0.02, shots=4096,
                        batch=2048, key=jax.random.PRNGKey(1))
    assert l3["syn_mismatch_rate"] == 0.0
    assert l5["syn_mismatch_rate"] == 0.0
    assert l5["ler"] < l3["ler"]


def test_uf_perfect_at_zero_noise():
    g = build_code("toric", 3)
    ev = ler_union_find(g, p=0.0, shots=256, batch=256)
    assert ev["ler"] == 0.0


@pytest.mark.skipif(not available(), reason="native library not built")
def test_native_f2_matches_python():
    rng = np.random.default_rng(0)
    for shape in [(5, 8), (16, 16), (33, 40), (40, 33)]:
        a = rng.integers(0, 2, shape).astype(np.uint8)
        r_n, piv_n = f2.row_reduce(a)
        r_p, piv_p = f2._row_reduce_py(a)
        np.testing.assert_array_equal(r_n, r_p)
        assert piv_n == piv_p
        assert f2.rank(a) == len(piv_p)
        ns = f2.nullspace(a)
        assert ns.shape[0] == shape[1] - len(piv_p)
        if ns.size:
            assert not ((ns @ a.T) % 2).any()
        b = rng.integers(0, 2, shape[0]).astype(np.uint8)
        x = f2._solve(a, b)
        if x is not None:
            np.testing.assert_array_equal((a @ x) % 2, b % 2)


def test_uf_decode_py_simple_chain():
    """Repetition-code chain: single defect pair resolved by one flip."""
    # 3 qubits, 2 checks: edges q0=(c0,-1)? repetition d=3: q0-c0-q1-c1-q2
    eu = np.array([0, 0, 1], np.int32)   # q0 touches c0 only, q1 c0&c1, q2 c1
    ev = np.array([-1, 1, -1], np.int32)
    s = np.array([1, 0], np.uint8)       # defect at c0 -> flip q0 (boundary)
    cor = uf_decode_py(eu, ev, 2, s)
    # the correction must reproduce the syndrome
    par0 = cor[0] ^ cor[1]
    par1 = cor[1] ^ cor[2]
    assert (par0, par1) == (1, 0)
