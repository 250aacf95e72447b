"""Roll-gather kernel (tpugnn/kernels/roll_gather.py) parity.

The raster rotation gathers must reproduce the gather-GEMM kernel: same
weights, same inputs, same math up to bf16 rounding / f32 reassociation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.kernels.fused_decoder import (
    RoundWeights,
    make_operators,
    rounds_xla,
)
from tpugnn.kernels.roll_gather import (
    decoder_rounds_roll,
    raster_plan,
)
from tpugnn.tanner import build_code


def _weights(key, h, mh):
    ks = iter(jax.random.split(key, 32))
    w = lambda *s: 0.1 * jax.random.normal(next(ks), s, dtype=jnp.float32)
    return RoundWeights(
        wd_c=w(h, mh), ws_c=w(h, mh), b0_c=w(1, mh), wo_c=w(mh, h),
        bo_c=w(1, h),
        wd_q=w(h, mh), ws_q=w(h, mh), b0_q=w(1, mh), wo_q=w(mh, h),
        bo_q=w(1, h),
        uc_x=w(h, h), uc_a=w(h, h), uc_s=w(1, h), uc_b0=w(1, h),
        uc_w1=w(h, h), uc_b1=w(1, h),
        uq_x=w(h, h), uq_a=w(h, h), uq_b0=w(1, h), uq_w1=w(h, h),
        uq_b1=w(1, h),
        lnc_scale=1.0 + w(1, h), lnc_bias=w(1, h),
        lnq_scale=1.0 + w(1, h), lnq_bias=w(1, h),
    )


@pytest.mark.parametrize("d", [3, 5, 11])
def test_raster_plan_structure(d):
    g = build_code("surface", d)
    plan = raster_plan(g)
    assert plan is not None, f"no plan for surface d={d}"
    assert plan.d == d
    assert plan.offs_c == (0, -1, -(d + 1), -(d + 2))
    assert plan.offs_q == (0, 1, d + 1, d + 2)
    # every edge covered exactly once
    assert plan.mask_c.sum() == g.n_edges
    assert plan.mask_q.sum() == g.n_edges
    # raster cells unique per real node
    assert len(set(plan.cell_of_check[: g.n_checks].tolist())) == g.n_checks
    assert len(set(plan.cell_of_qubit[: g.n_qubits].tolist())) == g.n_qubits


def test_raster_plan_rejects_non_surface():
    g = build_code("toric", 4)
    assert raster_plan(g) is None


@pytest.mark.parametrize("d,h", [(3, 32), (5, 32)])
def test_roll_rounds_match_xla(d, h):
    """Interpret-mode roll kernel == pure-XLA rounds on real rows."""
    g = build_code("surface", d)
    plan = raster_plan(g)
    assert plan is not None
    w = _weights(jax.random.PRNGKey(0), h, h)
    b = 8
    key = jax.random.PRNGKey(1)
    xc = 0.1 * jax.random.normal(key, (b, g.n_checks_pad, h))
    xq = 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                 (b, g.n_qubits_pad, h))
    # zero the padded rows like the real embed does
    xc = xc * np.asarray(g.check_mask)[None, :, None]
    xq = xq * np.asarray(g.qubit_mask)[None, :, None]
    syn = (jax.random.uniform(jax.random.PRNGKey(3),
                              (b, g.n_checks_pad, 1)) < 0.2
           ).astype(jnp.float32) * np.asarray(g.check_mask)[None, :, None]

    ops = make_operators(g)
    ref_c, ref_q = rounds_xla(xc, xq, syn, ops, w, rounds=3)

    plan_arrays = tuple(jnp.asarray(a) for a in (
        plan.cell_of_check, plan.cell_of_qubit, plan.mask_c, plan.mask_q,
        plan.deg_c, plan.deg_q))
    static_plan = (plan.d, plan.l_pad, plan.offs_c, plan.offs_q)
    out_c, out_q = decoder_rounds_roll(
        xc, xq, syn, plan_arrays, static_plan, w,
        rounds=3, interpret=True, compute_dtype="float32", block_batch=8,
    )
    m, n = g.n_checks, g.n_qubits
    np.testing.assert_allclose(np.asarray(out_c)[:, :m],
                               np.asarray(ref_c)[:, :m],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_q)[:, :n],
                               np.asarray(ref_q)[:, :n],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("d,h", [(3, 32)])
def test_roll_rounds_slot16_matches_xla(d, h):
    """The slot16 (bf16 slot-stage) roll path == pure-XLA rounds at bf16
    tolerance — the parity claim the slot_f32=False docstring makes
    [ADVICE r3]."""
    g = build_code("surface", d)
    plan = raster_plan(g)
    w = _weights(jax.random.PRNGKey(0), h, h)
    b = 8
    xc = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                 (b, g.n_checks_pad, h))
    xq = 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                 (b, g.n_qubits_pad, h))
    xc = xc * np.asarray(g.check_mask)[None, :, None]
    xq = xq * np.asarray(g.qubit_mask)[None, :, None]
    syn = (jax.random.uniform(jax.random.PRNGKey(3),
                              (b, g.n_checks_pad, 1)) < 0.2
           ).astype(jnp.float32) * np.asarray(g.check_mask)[None, :, None]

    ops = make_operators(g)
    ref_c, ref_q = rounds_xla(xc, xq, syn, ops, w, rounds=3)

    plan_arrays = tuple(jnp.asarray(a) for a in (
        plan.cell_of_check, plan.cell_of_qubit, plan.mask_c, plan.mask_q,
        plan.deg_c, plan.deg_q))
    static_plan = (plan.d, plan.l_pad, plan.offs_c, plan.offs_q)
    out_c, out_q = decoder_rounds_roll(
        xc, xq, syn, plan_arrays, static_plan, w,
        rounds=3, interpret=True, compute_dtype="bfloat16",
        slot_dtype="bfloat16", block_batch=8,
    )
    m, n = g.n_checks, g.n_qubits
    # bf16 slot sums: ~2-3 decimal digits over 3 LayerNormed rounds
    np.testing.assert_allclose(np.asarray(out_c)[:, :m],
                               np.asarray(ref_c)[:, :m],
                               rtol=0.08, atol=0.08)
    np.testing.assert_allclose(np.asarray(out_q)[:, :n],
                               np.asarray(ref_q)[:, :n],
                               rtol=0.08, atol=0.08)


def test_pallas_decoder_rollgather_matches_fused():
    """PallasDecoder(schedule=('rollgather',)) == the XLA fused backend on
    shared params (bf16 tolerance), including embed + readout."""
    from tpugnn.configs import ModelConfig
    from tpugnn.models import GNNDecoder
    from tpugnn.models.pallas_decoder import PallasDecoder
    from tpugnn.sampling import sample_batch

    g = build_code("surface", 3)
    cfg = ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="fused",
                      readout="per_qubit", dtype="bfloat16")
    model = GNNDecoder(cfg, k=g.k)
    key = jax.random.PRNGKey(0)
    params = model.init(key, g, jnp.zeros((2, g.n_checks_pad)))
    b = sample_batch(key, g, 0.08, 16)
    ref = model.apply(params, g, b.syndrome)
    out = PallasDecoder(cfg, k=g.k, schedule=("rollgather",)).apply(
        params, g, b.syndrome)
    np.testing.assert_allclose(
        np.asarray(out.qubit_logits)[:, : g.n_qubits],
        np.asarray(ref.qubit_logits)[:, : g.n_qubits],
        rtol=0.1, atol=0.15)
    # hard decisions should agree almost everywhere
    agree = (np.sign(np.asarray(out.qubit_logits))
             == np.sign(np.asarray(ref.qubit_logits))).mean()
    assert agree > 0.99
