"""Trainable Pallas path: custom-VJP gradients match the XLA fused backend."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpugnn.kernels.fused_decoder import (
    make_differentiable_rounds,
    make_operators,
    rounds_xla,
)
from tpugnn.models import GNNDecoder
from tpugnn.models.pallas_decoder import PallasDecoder, roundweights_from_flax
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code


def _setup(d=3, rounds=3, hidden=16):
    g = build_code("surface", d)
    cfg = ModelConfig(hidden=hidden, msg_hidden=hidden, rounds=rounds, backend="fused")
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 4)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)
    return g, cfg, model, params, b


def test_rounds_xla_matches_kernel():
    g, cfg, model, params, b = _setup()
    w = roundweights_from_flax(params["params"]["rounds"])
    ops = make_operators(g)
    B, H = 4, cfg.hidden
    xc = jax.random.normal(jax.random.PRNGKey(2), (B, g.n_checks_pad, H))
    xq = jax.random.normal(jax.random.PRNGKey(3), (B, g.n_qubits_pad, H))
    syn = jax.random.normal(jax.random.PRNGKey(4), (B, g.n_checks_pad, 1))
    from tpugnn.kernels.fused_decoder import decoder_rounds

    k_c, k_q = decoder_rounds(xc, xq, syn, ops, w, rounds=3, interpret=True,
                              compute_dtype="float32")
    x_c, x_q = rounds_xla(xc, xq, syn, ops, w, rounds=3)
    np.testing.assert_allclose(np.asarray(k_c), np.asarray(x_c), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(k_q), np.asarray(x_q), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("backward", ["pallas", "xla"])
def test_gradients_match_fused_backend(backward):
    g, cfg, model, params, b = _setup()
    pal = PallasDecoder(cfg, k=g.k, trainable=True, interpret=True,
                        backward=backward)

    def loss_with(apply_fn, p):
        out = apply_fn(p, g, b.syndrome)
        return jnp.sum(out.qubit_logits**2) + jnp.sum(out.logical_logits**2)

    g_ref = jax.grad(lambda p: loss_with(model.apply, p))(params)
    g_pal = jax.grad(lambda p: loss_with(pal.apply, p))(params)
    for a, c in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-3, rtol=5e-2)


@pytest.mark.parametrize("backward", ["pallas", "xla"])
def test_retrace_same_decoder_instance(backward):
    """Regression: one PallasDecoder instance used across two jit traces.

    The differentiable-rounds fn closes over operator arrays derived from
    ``graph``; with graph passed as a jit argument those are tracers, so
    caching the fn across traces leaked the first trace's tracers into the
    retrace (UnexpectedTracerError on any shape change / second jit).
    """
    g, cfg, model, params, b = _setup()
    pal = PallasDecoder(cfg, k=g.k, trainable=True, interpret=True,
                        backward=backward)

    @jax.jit
    def grad_step(p, graph, syndrome):
        def loss(pp):
            out = pal.apply(pp, graph, syndrome)
            return jnp.sum(out.qubit_logits**2)

        return jax.grad(loss)(p)

    grad_step(params, g, b.syndrome)  # trace 1: batch 4
    b8 = sample_batch(jax.random.PRNGKey(9), g, 0.08, 8)
    out = grad_step(params, g, b8.syndrome)  # retrace: batch 8
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_training_with_pallas_backend():
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.08),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="pallas"),
        train=TrainConfig(batch=32, steps=20, warmup_steps=4, eval_every=20,
                          eval_shots=128),
    )
    from tpugnn.train import train

    state, model, graph, hist = train(cfg, log=lambda *_: None)
    assert int(state.step) == 20
    assert np.isfinite(hist[-1]["loss"])


def test_inference_overrides_match_default():
    """schedule/tile_batch overrides are exact rewrites: same outputs."""
    import numpy as np

    g, cfg, model, params, b = _setup(d=3, rounds=2, hidden=16)
    base = PallasDecoder(cfg, k=g.k, interpret=True).apply(
        params, g, b.syndrome)
    for kw in ({"schedule": ("sumrelu", "fold", "biggather")},
               {"tile_batch": 2},
               {"schedule": ("sumrelu", "fold"), "tile_batch": 1}):
        alt = PallasDecoder(cfg, k=g.k, interpret=True, **kw).apply(
            params, g, b.syndrome)
        np.testing.assert_allclose(
            np.asarray(alt.qubit_logits), np.asarray(base.qubit_logits),
            atol=1e-4, rtol=1e-4, err_msg=str(kw))
