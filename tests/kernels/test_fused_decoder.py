"""Fused R-round Pallas kernel vs the XLA 'fused' model (interpret on CPU)."""

import jax
import numpy as np
import pytest

from tpugnn.configs import ModelConfig
from tpugnn.models import GNNDecoder
from tpugnn.models.pallas_decoder import PallasDecoder
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code


@pytest.mark.parametrize("family,d,rounds", [("surface", 3, 2), ("surface", 5, 4), ("toric", 3, 3)])
def test_kernel_matches_fused_model(family, d, rounds):
    g = build_code(family, d)
    cfg = ModelConfig(hidden=32, msg_hidden=32, rounds=rounds, backend="fused")
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 4)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)

    ref = model.apply(params, g, b.syndrome)
    pal = PallasDecoder(cfg, k=g.k, interpret=True)
    got = pal.apply(params, g, b.syndrome)

    np.testing.assert_allclose(
        np.asarray(got.qubit_logits), np.asarray(ref.qubit_logits),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got.logical_logits), np.asarray(ref.logical_logits),
        atol=5e-4, rtol=1e-3,
    )
    # identical hard corrections
    np.testing.assert_array_equal(
        np.asarray(got.qubit_logits > 0), np.asarray(ref.qubit_logits > 0)
    )


def test_kernel_in_mc_eval():
    """PallasDecoder drops into the Monte-Carlo LER harness."""
    from tpugnn.eval import ler_monte_carlo

    g = build_code("surface", 3)
    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="fused")
    model = GNNDecoder(cfg, k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.05, 2)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)
    pal = PallasDecoder(cfg, k=g.k, interpret=True)
    ev = ler_monte_carlo(pal.apply, params, g, p=0.05, shots=256, batch=128,
                         key=jax.random.PRNGKey(2))
    assert 0.0 <= ev["ler"] <= 1.0
