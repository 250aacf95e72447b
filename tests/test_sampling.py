"""On-device sampling: noise statistics + syndrome physics invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.sampling import logical_class_bits, sample_batch, sample_depolarizing, syndrome
from tpugnn.tanner import build_code


def test_depolarizing_statistics():
    g = build_code("surface", 5)
    p = 0.12
    ex, ez = sample_depolarizing(jax.random.PRNGKey(7), g, p, 20000)
    ex = np.asarray(ex)[:, : g.n_qubits]
    ez = np.asarray(ez)[:, : g.n_qubits]
    # marginal rates: P(ex=1) = P(X) + P(Y) = 2p/3, same for ez
    assert abs(ex.mean() - 2 * p / 3) < 0.005
    assert abs(ez.mean() - 2 * p / 3) < 0.005
    # joint: P(ex=1, ez=1) = P(Y) = p/3
    assert abs((ex * ez).mean() - p / 3) < 0.005
    # any error: p
    assert abs(np.maximum(ex, ez).mean() - p) < 0.005


def test_padded_qubits_never_err():
    g = build_code("surface", 3)
    ex, ez = sample_depolarizing(jax.random.PRNGKey(0), g, 0.5, 512)
    assert not np.asarray(ex)[:, g.n_qubits :].any()
    assert not np.asarray(ez)[:, g.n_qubits :].any()


def test_syndrome_matches_oracle():
    """Device f32-matmul syndrome == naive numpy mod-2 loop."""
    g = build_code("toric", 3)
    b = sample_batch(jax.random.PRNGKey(3), g, 0.15, 64)
    hx = np.asarray(g.h_syn_ez)[: g.n_checks, : g.n_qubits]
    hz = np.asarray(g.h_syn_ex)[: g.n_checks, : g.n_qubits]
    ex = np.asarray(b.ex)[:, : g.n_qubits].astype(np.uint8)
    ez = np.asarray(b.ez)[:, : g.n_qubits].astype(np.uint8)
    s_ref = (ez @ hx.T + ex @ hz.T) % 2
    assert np.array_equal(np.asarray(b.syndrome)[:, : g.n_checks], s_ref)
    # padded checks always zero
    assert not np.asarray(b.syndrome)[:, g.n_checks :].any()


def test_zero_noise_zero_syndrome():
    g = build_code("surface", 5)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.0, 16)
    assert not np.asarray(b.syndrome).any()
    assert not np.asarray(b.class_bits).any()


def test_logical_class_bits_detect_logical():
    """Adding a logical operator to an error flips exactly its class bit."""
    g = build_code("surface", 3)
    b = sample_batch(jax.random.PRNGKey(5), g, 0.05, 8)
    bits0 = np.asarray(b.class_bits)
    lx = jnp.asarray(g.logicals_x[0])
    ex2 = jnp.mod(b.ex + lx[None, :], 2.0)
    s2 = syndrome(g, ex2, b.ez)
    assert np.array_equal(np.asarray(s2), np.asarray(b.syndrome)), "logical op changed syndrome"
    bits1 = np.asarray(logical_class_bits(g, ex2, b.ez, s2))
    # bx bit 0 flips (pairing <lz_0, lx_0> = 1), bz bits unchanged
    assert np.array_equal(bits1[:, 0], (bits0[:, 0] + 1) % 2)
    assert np.array_equal(bits1[:, 1:], bits0[:, 1:])


def test_sampling_is_deterministic_in_key():
    g = build_code("repetition", 5)
    a = sample_batch(jax.random.PRNGKey(9), g, 0.2, 32)
    b = sample_batch(jax.random.PRNGKey(9), g, 0.2, 32)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_hybrid_failure_rule():
    """Hybrid rule: per-qubit when consistent, logical fallback otherwise."""
    import jax.numpy as jnp
    from tpugnn.eval.ler import count_failures
    from tpugnn.sampling import sample_batch as _sb

    g = build_code("surface", 3)
    b = _sb(jax.random.PRNGKey(0), g, 0.1, 64)
    # perfect correction: hybrid never fails
    perfect = count_failures(g, b, b.ex, b.ez, jnp.where(b.class_bits > 0, 10.0, -10.0))
    assert float(perfect["fail_hybrid"].sum()) == 0.0
    assert float(perfect["fail_qubit"].sum()) == 0.0
    # garbage per-qubit correction but perfect class bits: hybrid rescues
    # exactly the syndrome-inconsistent shots
    bad_ex = jnp.ones_like(b.ex) * g.qubit_mask
    wrong = count_failures(g, b, bad_ex, b.ez, jnp.where(b.class_bits > 0, 10.0, -10.0))
    mism = wrong["syn_mismatch"] > 0
    assert float(wrong["fail_hybrid"][mism].sum()) == 0.0
