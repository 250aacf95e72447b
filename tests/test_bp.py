"""Min-sum BP baseline: exact-on-trees check, physics invariants, LER sanity."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.baselines.bp import bp_decode, bp_posteriors
from tpugnn.eval.baseline import ler_bp, ler_union_find
from tpugnn.sampling import sample_batch
from tpugnn.sampling.noise import syndrome
from tpugnn.tanner import build_code


def test_bp_repetition_matches_bruteforce_ml():
    """The repetition code's (single-sector) Tanner graph is a chain — BP is
    exact there: min-sum with alpha=1 computes per-bit max-product
    marginals.  Compare hard decisions against brute-force enumeration of
    the most-likely error consistent with each syndrome."""
    d = 5
    g = build_code("repetition", d)
    n, m = g.n_qubits, g.n_checks
    h = np.asarray(g.h_syn_ex)[:m, :n]  # repetition: Z-type checks, ex errors
    assert h.sum() > 0
    p = 0.08
    q = 2 * p / 3

    # all syndromes reachable from weight<=2 errors
    errs = [np.zeros(n, np.uint8)]
    for i in range(n):
        e = np.zeros(n, np.uint8); e[i] = 1; errs.append(e)
    for i, j in itertools.combinations(range(n), 2):
        e = np.zeros(n, np.uint8); e[i] = 1; e[j] = 1; errs.append(e)

    # brute-force: most likely error for a syndrome = argmax over all 2^n
    all_e = np.array(list(itertools.product([0, 1], repeat=n)), np.uint8)
    all_s = all_e @ h.T % 2
    weight = all_e.sum(1)

    syn_batch = np.stack([(e @ h.T % 2) for e in errs]).astype(np.float32)
    syn_pad = np.zeros((len(errs), g.n_checks_pad), np.float32)
    syn_pad[:, :m] = syn_batch
    ex_hat, ez_hat = bp_decode(g, jnp.asarray(syn_pad), p, iters=16, alpha=1.0)
    ex_hat = np.asarray(ex_hat)[:, :n]

    for si, s in enumerate(syn_batch):
        match = np.all(all_s == s.astype(np.uint8), axis=1)
        ml = all_e[match][np.argmin(weight[match])]
        np.testing.assert_array_equal(
            ex_hat[si].astype(np.uint8), ml,
            err_msg=f"syndrome {s} decoded {ex_hat[si]} want {ml}",
        )


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 4)])
def test_bp_reproduces_syndrome_at_low_p(family, d):
    g = build_code(family, d)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.01, 512)
    ex_hat, ez_hat = bp_decode(g, b.syndrome, 0.01, iters=32)
    s_hat = syndrome(g, ex_hat, ez_hat)
    agree = float(jnp.mean(jnp.all(s_hat == b.syndrome, axis=-1)))
    assert agree > 0.9, f"syndrome reproduction rate {agree}"


def test_bp_zero_syndrome_zero_correction():
    g = build_code("surface", 5)
    s = jnp.zeros((3, g.n_checks_pad))
    ex_hat, ez_hat = bp_decode(g, s, 0.05)
    assert float(jnp.sum(ex_hat)) == 0.0 and float(jnp.sum(ez_hat)) == 0.0


def test_bp_ler_sane_and_below_threshold_ordering():
    g3 = build_code("surface", 3)
    lo = ler_bp(g3, p=0.005, shots=2048, batch=1024, iters=24)
    hi = ler_bp(g3, p=0.08, shots=2048, batch=1024, iters=24)
    assert 0.0 <= lo["ler"] < hi["ler"] <= 1.0
    assert lo["ler"] < 0.05


def test_bp_posteriors_shapes_and_masking():
    g = build_code("toric", 3)
    b = sample_batch(jax.random.PRNGKey(1), g, 0.03, 4)
    l_ex, l_ez = bp_posteriors(g, b.syndrome, 0.03, iters=8)
    assert l_ex.shape == (4, g.n_qubits_pad) and l_ez.shape == l_ex.shape
    ex_hat, ez_hat = bp_decode(g, b.syndrome, 0.03, iters=8)
    # padded qubits never flip
    assert float(jnp.sum(ex_hat[:, g.n_qubits:])) == 0.0
    assert float(jnp.sum(ez_hat[:, g.n_qubits:])) == 0.0
