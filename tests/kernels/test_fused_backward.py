"""Fused Pallas backward vs jax.grad through the XLA twin (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.kernels.fused_backward import kernel_trained_rounds
from tpugnn.kernels.fused_decoder import make_operators, rounds_xla
from tpugnn.models.pallas_decoder import roundweights_from_flax
from tpugnn.configs import ModelConfig
from tpugnn.models import GNNDecoder
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code


def _setup(family="surface", d=3, rounds=3, hidden=32, batch=8, seed=0):
    g = build_code(family, d)
    cfg = ModelConfig(hidden=hidden, msg_hidden=hidden, rounds=rounds,
                      backend="fused")
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(seed), g, 0.08, batch)
    params = model.init(jax.random.PRNGKey(seed + 1), g, b.syndrome)
    w = roundweights_from_flax(params["params"]["rounds"])
    ops = make_operators(g)
    key = jax.random.PRNGKey(seed + 2)
    kc, kq = jax.random.split(key)
    m_pad, n_pad = g.n_checks_pad, g.n_qubits_pad
    xc = jax.random.normal(kc, (batch, m_pad, hidden), jnp.float32)
    xq = jax.random.normal(kq, (batch, n_pad, hidden), jnp.float32)
    syn = (b.syndrome * 2.0 - 1.0)[..., None]
    return g, ops, w, xc, xq, syn, rounds


@pytest.mark.parametrize("family,d,rounds", [("surface", 3, 2), ("toric", 3, 3)])
def test_forward_matches_xla_twin(family, d, rounds):
    g, ops, w, xc, xq, syn, _ = _setup(family, d, rounds)
    f = kernel_trained_rounds(ops, rounds=rounds, compute_dtype="float32",
                              interpret=True)
    got_c, got_q = f(xc, xq, syn, w)
    ref_c, ref_q = rounds_xla(xc, xq, syn, ops, w, rounds=rounds)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("family,d,rounds,ablate", [
    ("surface", 3, 2, None),       # None -> PROD_VARIANTS (promoted schedule)
    ("surface", 5, 3, None),
    ("surface", 3, 2, ()),         # base schedule stays covered
    ("surface", 3, 3, ("fold",)),  # fold alone (folded-operand grad un-fold)
])
def test_gradients_match_xla_twin(family, d, rounds, ablate):
    g, ops, w, xc, xq, syn, _ = _setup(family, d, rounds)
    f = kernel_trained_rounds(ops, rounds=rounds, compute_dtype="float32",
                              interpret=True, ablate=ablate)
    kc2, kq2 = jax.random.split(jax.random.PRNGKey(7))
    cot_c = jax.random.normal(kc2, xc.shape, jnp.float32)
    cot_q = jax.random.normal(kq2, xq.shape, jnp.float32)

    def loss_k(xc, xq, syn, w):
        oc, oq = f(xc, xq, syn, w)
        return jnp.sum(oc * cot_c) + jnp.sum(oq * cot_q)

    def loss_x(xc, xq, syn, w):
        oc, oq = rounds_xla(xc, xq, syn, ops, w, rounds=rounds)
        return jnp.sum(oc * cot_c) + jnp.sum(oq * cot_q)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(xc, xq, syn, w)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(xc, xq, syn, w)
    names = ["dxc", "dxq", "dsyn"]
    for name, a, b in zip(names, gk[:3], gx[:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=name,
        )
    # weight grads, leaf by leaf
    for fld in type(w)._fields:
        a, b = getattr(gk[3], fld), getattr(gx[3], fld)
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * scale, rtol=5e-3,
            err_msg=f"weight grad {fld}",
        )


def test_gradcheck_directional():
    """Directional finite-difference check on the input states (f32).

    The mean-output loss keeps FD cancellation noise small; relu kinks make
    pointwise FD flaky, so a random direction + loose tolerance is the
    right check (the tight check is analytic-vs-analytic above).
    """
    g, ops, w, xc, xq, syn, rounds = _setup("surface", 3, 2, hidden=16, batch=4)
    f = kernel_trained_rounds(ops, rounds=rounds, compute_dtype="float32",
                              interpret=True)

    def loss(xc):
        oc, oq = f(xc, xq, syn, w)
        return jnp.mean(jnp.tanh(oc)) + jnp.mean(jnp.tanh(oq))

    v = jax.random.normal(jax.random.PRNGKey(11), xc.shape)
    v = v / jnp.linalg.norm(v)
    gan = float(jnp.vdot(jax.grad(loss)(xc), v))
    eps = 1e-2
    fd = float((loss(xc + eps * v) - loss(xc - eps * v)) / (2 * eps))
    np.testing.assert_allclose(gan, fd, rtol=5e-2, atol=1e-5)


def test_bf16_path_runs_and_correlates():
    """bf16 compute: grads within mixed-precision tolerance of f32 XLA."""
    g, ops, w, xc, xq, syn, rounds = _setup("surface", 3, 2, hidden=32, batch=8)
    f = kernel_trained_rounds(ops, rounds=rounds, compute_dtype="bfloat16",
                              interpret=True)

    def loss_k(w):
        oc, oq = f(xc, xq, syn, w)
        return jnp.mean(oc ** 2) + jnp.mean(oq ** 2)

    def loss_x(w):
        oc, oq = rounds_xla(xc, xq, syn, ops, w, rounds=rounds)
        return jnp.mean(oc ** 2) + jnp.mean(oq ** 2)

    gk = jax.grad(loss_k)(w)
    gx = jax.grad(loss_x)(w)
    for fld in type(w)._fields:
        a = np.asarray(getattr(gk, fld)).ravel()
        b = np.asarray(getattr(gx, fld)).ravel()
        if np.linalg.norm(b) < 1e-6:
            continue
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.98, f"{fld}: cosine {cos}"


def test_rolled_equals_unrolled_rounds():
    """fori_loop round walk (default) == static unroll, values and grads."""
    g, ops, w, xc, xq, syn, rounds = _setup(rounds=4)
    f_roll = kernel_trained_rounds(ops, rounds=rounds, compute_dtype="float32",
                                   interpret=True, unroll_rounds=False)
    f_unroll = kernel_trained_rounds(ops, rounds=rounds,
                                     compute_dtype="float32",
                                     interpret=True, unroll_rounds=True)

    def loss(f, xc, xq, syn, w):
        oc, oq = f(xc, xq, syn, w)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(jnp.cos(oq))

    import functools

    va, ga = jax.value_and_grad(functools.partial(loss, f_roll),
                                argnums=(0, 3))(xc, xq, syn, w)
    vb, gb = jax.value_and_grad(functools.partial(loss, f_unroll),
                                argnums=(0, 3))(xc, xq, syn, w)
    assert abs(float(va) - float(vb)) < 1e-6 * max(1.0, abs(float(vb)))
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
