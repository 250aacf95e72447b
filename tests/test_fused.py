"""Fused round cell: exact parity with the generic cell via param conversion."""

import jax
import numpy as np
import pytest

from tpugnn.configs import ModelConfig
from tpugnn.models import GNNDecoder
from tpugnn.models.fused_cell import convert_generic_round_params
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code


def _convert(params):
    p = jax.tree.map(lambda x: x, params)  # shallow copy via rebuild
    import flax

    p = flax.core.unfreeze(p) if hasattr(flax.core, "unfreeze") else p
    rounds = dict(p["params"]["rounds"])
    p["params"] = dict(p["params"])
    p["params"]["rounds"] = convert_generic_round_params(rounds)
    return p


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 3)])
@pytest.mark.parametrize("weight_tied", [True, False])
def test_fused_matches_generic(family, d, weight_tied):
    g = build_code(family, d)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 8)
    mk = lambda be: GNNDecoder(
        ModelConfig(hidden=32, msg_hidden=48, rounds=3, backend=be,
                    weight_tied=weight_tied),
        k=g.k,
    )
    gen, fus = mk("ell"), mk("fused")
    params = gen.init(jax.random.PRNGKey(1), g, b.syndrome)
    out_g = gen.apply(params, g, b.syndrome)
    out_f = fus.apply(_convert(params), g, b.syndrome)
    np.testing.assert_allclose(
        np.asarray(out_f.qubit_logits), np.asarray(out_g.qubit_logits),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f.logical_logits), np.asarray(out_g.logical_logits),
        atol=2e-4, rtol=1e-4,
    )


def test_fused_requires_sum():
    g = build_code("surface", 3)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.05, 2)
    m = GNNDecoder(ModelConfig(hidden=8, msg_hidden=8, rounds=1,
                               backend="fused", aggr="max"), k=g.k)
    with pytest.raises(ValueError, match="sum"):
        m.init(jax.random.PRNGKey(1), g, b.syndrome)


def test_fused_trains():
    """The fused backend learns (grad path through the fused algebra works)."""
    from tpugnn.configs import CodeConfig, ExperimentConfig, TrainConfig
    from tpugnn.train import train

    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="fused"),
        train=TrainConfig(batch=128, steps=120, eval_every=120, eval_shots=512),
    )
    _, _, _, history = train(cfg, log=lambda *_: None)
    assert history[-1]["loss"] < 0.8
    assert history[-1]["ler"] < 0.5
