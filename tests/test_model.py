"""Decoder model: shapes, determinism, jit/scan, weight tying, backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.configs import ModelConfig
from tpugnn.models import GNNDecoder
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code


def _setup(family="surface", d=3, **kw):
    g = build_code(family, d)
    cfg = ModelConfig(hidden=32, msg_hidden=32, rounds=3, **kw)
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 4)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)
    return g, model, params, b


def test_output_shapes():
    g, model, params, b = _setup()
    out = model.apply(params, g, b.syndrome)
    assert out.qubit_logits.shape == (4, g.n_qubits_pad, 2)
    assert out.logical_logits.shape == (4, 2 * g.k)


def test_readout_modes():
    g, model, params, b = _setup(readout="per_qubit")
    out = model.apply(params, g, b.syndrome)
    assert out.logical_logits is None
    g, model, params, b = _setup(readout="logical")
    out = model.apply(params, g, b.syndrome)
    assert out.logical_logits is not None


def test_jit_and_determinism():
    g, model, params, b = _setup()
    f = jax.jit(model.apply)
    o1 = f(params, g, b.syndrome)
    o2 = f(params, g, b.syndrome)
    np.testing.assert_array_equal(np.asarray(o1.qubit_logits), np.asarray(o2.qubit_logits))
    o3 = model.apply(params, g, b.syndrome)
    np.testing.assert_allclose(
        np.asarray(o1.qubit_logits), np.asarray(o3.qubit_logits), atol=1e-5
    )


def test_weight_tied_param_count():
    g, m_tied, p_tied, b = _setup(weight_tied=True)
    g2, m_per, p_per, b2 = _setup(weight_tied=False)
    n_tied = sum(x.size for x in jax.tree.leaves(p_tied))
    n_per = sum(x.size for x in jax.tree.leaves(p_per))
    assert n_per > n_tied  # per-round weights replicate the round cell


def test_backend_equivalence_full_model():
    g = build_code("surface", 3)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 4)
    cfg_s = ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="segment")
    cfg_d = ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="dense")
    model_s, model_d = GNNDecoder(cfg_s, k=g.k), GNNDecoder(cfg_d, k=g.k)
    params = model_s.init(jax.random.PRNGKey(1), g, b.syndrome)
    out_s = model_s.apply(params, g, b.syndrome)
    out_d = model_d.apply(params, g, b.syndrome)
    np.testing.assert_allclose(
        np.asarray(out_s.qubit_logits), np.asarray(out_d.qubit_logits), atol=2e-4
    )


def test_syndrome_dependence():
    """Different syndromes must produce different outputs (not constant)."""
    g, model, params, b = _setup()
    s0 = jnp.zeros_like(b.syndrome)
    o0 = model.apply(params, g, s0)
    o1 = model.apply(params, g, b.syndrome)
    if bool(jnp.any(b.syndrome > 0)):
        assert not np.allclose(
            np.asarray(o0.qubit_logits), np.asarray(o1.qubit_logits), atol=1e-6
        )


@pytest.mark.parametrize("family,d", [("toric", 3), ("repetition", 5)])
def test_other_families(family, d):
    g, model, params, b = _setup(family=family, d=d)
    out = model.apply(params, g, b.syndrome)
    assert out.qubit_logits.shape[1] == g.n_qubits_pad
    assert out.logical_logits.shape == (4, 2 * g.k)


def test_pauli4_head():
    from tpugnn.configs import CodeConfig, ExperimentConfig, TrainConfig
    from tpugnn.eval.ler import decode_corrections
    from tpugnn.train import train
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.08),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, qubit_head="pauli4"),
        train=TrainConfig(batch=64, steps=30, warmup_steps=5, eval_every=30,
                          eval_shots=256),
    )
    state, model, graph, hist = train(cfg, log=lambda *_: None)
    b = sample_batch(jax.random.PRNGKey(0), graph, 0.08, 8)
    out = model.apply(state.params, graph, b.syndrome)
    assert out.qubit_logits.shape == (8, graph.n_qubits_pad, 4)
    ex, ez = decode_corrections(out.qubit_logits)
    assert set(np.unique(np.asarray(ex))) <= {0.0, 1.0}
    assert set(np.unique(np.asarray(ez))) <= {0.0, 1.0}
    # mapping sanity: class 3 = Y = (ex=1, ez=1)
    fake = jnp.full((1, 4, 4), -10.0).at[..., 3].set(10.0)
    ex, ez = decode_corrections(fake)
    assert ex.sum() == 4 and ez.sum() == 4


def test_gru_update_variant():
    g = build_code("surface", 3)
    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=3, update="gru",
                      backend="segment")
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 4)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)
    out = model.apply(params, g, b.syndrome)
    assert out.qubit_logits.shape == (4, g.n_qubits_pad, 2)
    # trains: gradient flows through the GRU gates
    import optax
    from tpugnn.configs import CodeConfig, ExperimentConfig, TrainConfig
    from tpugnn.train import train

    ecfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.08),
        model=cfg,
        train=TrainConfig(batch=32, steps=15, warmup_steps=3, eval_every=15,
                          eval_shots=64),
    )
    state, _, _, hist = train(ecfg, log=lambda *_: None)
    assert np.isfinite(hist[-1]["loss"])


def test_fused_rejects_gru():
    import pytest as _pytest

    g = build_code("surface", 3)
    cfg = ModelConfig(hidden=8, msg_hidden=8, rounds=1, update="gru", backend="fused")
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.05, 2)
    with _pytest.raises(ValueError, match="mlp"):
        model.init(jax.random.PRNGKey(1), g, b.syndrome)
