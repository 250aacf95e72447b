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


def test_sumrelu_variant_matches_base():
    """ablate=('sumrelu',) is an exact rewrite of the slot reduction
    (relu(z+y) == max(z,-y)+y with the +ydb sum hoisted): outputs must match
    the base kernel up to f32 reassociation."""
    import jax.numpy as jnp

    from tpugnn.kernels.fused_decoder import (
        RoundWeights, decoder_rounds, make_operators,
    )

    g = build_code("surface", 5)
    h, mh, b, r = 32, 32, 8, 4
    keys = iter(jax.random.split(jax.random.PRNGKey(3), 32))

    def w(*shape):
        return 0.3 * jax.random.normal(next(keys), shape, dtype=jnp.float32)

    weights = RoundWeights(
        wd_c=w(h, mh), ws_c=w(h, mh), b0_c=w(1, mh), wo_c=w(mh, h), bo_c=w(1, h),
        wd_q=w(h, mh), ws_q=w(h, mh), b0_q=w(1, mh), wo_q=w(mh, h), bo_q=w(1, h),
        uc_x=w(h, h), uc_a=w(h, h), uc_s=w(1, h), uc_b0=w(1, h),
        uc_w1=w(h, h), uc_b1=w(1, h),
        uq_x=w(h, h), uq_a=w(h, h), uq_b0=w(1, h), uq_w1=w(h, h), uq_b1=w(1, h),
        lnc_scale=1.0 + w(1, h), lnc_bias=w(1, h),
        lnq_scale=1.0 + w(1, h), lnq_bias=w(1, h),
    )
    ops = make_operators(g)
    xc = w(b, g.n_checks_pad, h)
    xq = w(b, g.n_qubits_pad, h)
    syn = (jax.random.uniform(next(keys), (b, g.n_checks_pad, 1)) < 0.2
           ).astype(jnp.float32)

    kw = dict(rounds=r, interpret=True, compute_dtype="float32", block_batch=4)
    base = decoder_rounds(xc, xq, syn, ops, weights, **kw)
    for ablate in (("sumrelu",), ("fold",), ("interleave",), ("ln1pass",),
                   ("fold", "biasfold"),
                   ("biggather",),
                   ("sumrelu", "fold", "biggather"),
                   ("sumrelu", "fold", "interleave"),
                   ("sumrelu", "fold", "interleave", "ln1pass", "biasfold")):
        alt = decoder_rounds(xc, xq, syn, ops, weights, ablate=ablate, **kw)
        for a, bso in zip(alt, base):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bso),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=str(ablate))
    with pytest.raises(ValueError, match="biasfold requires fold"):
        decoder_rounds(xc, xq, syn, ops, weights, ablate=("biasfold",), **kw)


def test_prod_variants_match_original_schedule():
    """Whatever PROD_VARIANTS promotes must compute the base function."""
    import jax.numpy as jnp

    from tpugnn.kernels.fused_decoder import (
        RoundWeights, decoder_rounds, make_operators,
    )

    g = build_code("surface", 3)
    h, mh, b, r = 16, 16, 4, 3
    keys = iter(jax.random.split(jax.random.PRNGKey(9), 32))

    def w(*shape):
        return 0.3 * jax.random.normal(next(keys), shape, dtype=jnp.float32)

    weights = RoundWeights(
        wd_c=w(h, mh), ws_c=w(h, mh), b0_c=w(1, mh), wo_c=w(mh, h), bo_c=w(1, h),
        wd_q=w(h, mh), ws_q=w(h, mh), b0_q=w(1, mh), wo_q=w(mh, h), bo_q=w(1, h),
        uc_x=w(h, h), uc_a=w(h, h), uc_s=w(1, h), uc_b0=w(1, h),
        uc_w1=w(h, h), uc_b1=w(1, h),
        uq_x=w(h, h), uq_a=w(h, h), uq_b0=w(1, h), uq_w1=w(h, h), uq_b1=w(1, h),
        lnc_scale=1.0 + w(1, h), lnc_bias=w(1, h),
        lnq_scale=1.0 + w(1, h), lnq_bias=w(1, h),
    )
    ops = make_operators(g)
    xc = w(b, g.n_checks_pad, h)
    xq = w(b, g.n_qubits_pad, h)
    syn = (jax.random.uniform(next(keys), (b, g.n_checks_pad, 1)) < 0.2
           ).astype(jnp.float32)
    kw = dict(rounds=r, interpret=True, compute_dtype="float32", block_batch=4)
    prod = decoder_rounds(xc, xq, syn, ops, weights, **kw)            # None -> PROD
    base = decoder_rounds(xc, xq, syn, ops, weights, ablate=(), **kw)
    for a, bso in zip(prod, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bso),
                                   atol=1e-5, rtol=1e-5)


def test_narrow_msg_width_pads_exactly():
    """mh not lane-aligned (24): auto-padded kernel matches the XLA twin."""
    import jax.numpy as jnp

    from tpugnn.kernels.fused_decoder import (
        RoundWeights, decoder_rounds, make_operators, rounds_xla,
    )

    g = build_code("surface", 3)
    h, mh, b, r = 16, 24, 4, 3
    keys = iter(jax.random.split(jax.random.PRNGKey(21), 32))

    def w(*shape):
        return 0.3 * jax.random.normal(next(keys), shape, dtype=jnp.float32)

    weights = RoundWeights(
        wd_c=w(h, mh), ws_c=w(h, mh), b0_c=w(1, mh), wo_c=w(mh, h), bo_c=w(1, h),
        wd_q=w(h, mh), ws_q=w(h, mh), b0_q=w(1, mh), wo_q=w(mh, h), bo_q=w(1, h),
        uc_x=w(h, h), uc_a=w(h, h), uc_s=w(1, h), uc_b0=w(1, h),
        uc_w1=w(h, h), uc_b1=w(1, h),
        uq_x=w(h, h), uq_a=w(h, h), uq_b0=w(1, h), uq_w1=w(h, h), uq_b1=w(1, h),
        lnc_scale=1.0 + w(1, h), lnc_bias=w(1, h),
        lnq_scale=1.0 + w(1, h), lnq_bias=w(1, h),
    )
    ops = make_operators(g)
    xc = w(b, g.n_checks_pad, h)
    xq = w(b, g.n_qubits_pad, h)
    syn = (jax.random.uniform(next(keys), (b, g.n_checks_pad, 1)) < 0.2
           ).astype(jnp.float32)
    got = decoder_rounds(xc, xq, syn, ops, weights, rounds=r, interpret=True,
                         compute_dtype="float32", block_batch=4)
    ref = rounds_xla(xc, xq, syn, ops, weights, rounds=r)
    for a, bso in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bso),
                                   atol=1e-5, rtol=1e-5)
