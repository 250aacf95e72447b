"""End-to-end activation parity vs the torch reference-mechanics decoder.

This is the BASELINE.json "allclose per-layer activations" gate, targeted at
the closest available stand-in for the (unavailable) reference: a PyTorch
implementation using index_select + index_add per round (SURVEY.md §4.1).
"""

import jax
import numpy as np
import pytest

from tests.oracle.torch_decoder import TorchDecoder
from tpugnn.configs import ModelConfig
from tpugnn.models import GNNDecoder
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 3), ("repetition", 7)])
@pytest.mark.parametrize("backend", ["segment", "ell", "fused"])
def test_full_forward_matches_torch(family, d, backend):
    g = build_code(family, d)
    cfg = ModelConfig(hidden=32, msg_hidden=48, rounds=4, backend=backend)
    # params in the generic layout; converted for the fused backend
    gen = GNNDecoder(ModelConfig(hidden=32, msg_hidden=48, rounds=4, backend="segment"), k=g.k)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 8)
    params = gen.init(jax.random.PRNGKey(1), g, b.syndrome)

    oracle = TorchDecoder(jax.tree.map(np.asarray, params), g, rounds=4)
    ref_q, ref_l = oracle.forward(np.asarray(b.syndrome))

    if backend == "fused":
        from tpugnn.models.fused_cell import convert_generic_round_params

        p = {"params": dict(params["params"])}
        p["params"]["rounds"] = convert_generic_round_params(
            dict(p["params"]["rounds"])
        )
        model, use = GNNDecoder(cfg, k=g.k), p
    else:
        model, use = GNNDecoder(cfg, k=g.k), params
    out = model.apply(use, g, b.syndrome)

    np.testing.assert_allclose(np.asarray(out.qubit_logits), ref_q, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.logical_logits), ref_l, atol=2e-4, rtol=1e-3)


def test_pallas_kernel_matches_torch():
    """The fused Pallas kernel agrees with the torch-mechanics oracle."""
    from tpugnn.models.fused_cell import convert_generic_round_params
    from tpugnn.models.pallas_decoder import PallasDecoder

    g = build_code("surface", 5)
    gen = GNNDecoder(ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="segment"), k=g.k)
    b = sample_batch(jax.random.PRNGKey(2), g, 0.08, 4)
    params = gen.init(jax.random.PRNGKey(3), g, b.syndrome)
    oracle = TorchDecoder(jax.tree.map(np.asarray, params), g, rounds=3)
    ref_q, ref_l = oracle.forward(np.asarray(b.syndrome))

    p = {"params": dict(params["params"])}
    p["params"]["rounds"] = convert_generic_round_params(dict(p["params"]["rounds"]))
    cfg = ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="fused")
    pal = PallasDecoder(cfg, k=g.k, interpret=True)
    out = pal.apply(p, g, b.syndrome)
    np.testing.assert_allclose(np.asarray(out.qubit_logits), ref_q, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.logical_logits), ref_l, atol=5e-4, rtol=1e-3)
