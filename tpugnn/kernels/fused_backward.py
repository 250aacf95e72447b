"""Fused Pallas BACKWARD for the R-round decoder: training at kernel speed.

The trainable path so far ran the fused forward kernel with a
rematerialized pure-XLA backward (fused_decoder.make_differentiable_rounds)
— correct, but the backward then pays the unfused XLA cost that the forward
kernel exists to avoid.  This module keeps the whole VJP on-chip:

* **forward+stash kernel** — the production round loop, additionally
  writing each round's input states to HBM ([R, rows, TB, H] per node
  type, the only residuals needed: everything else is recomputed).
* **backward kernel** — per batch tile, walks rounds in reverse; for each
  round it replays the forward from the stashed states (VMEM-resident,
  same GEMM structure) and chains the adjoint: LayerNorm backward,
  transposed-weight GEMMs, relu masks, and the slot-gather adjoint as
  transposed one-hot GEMMs (scatter = gather^T, still MXU work, still
  deterministic).  Weight gradients accumulate across grid steps into
  revisited output blocks (initialized at program 0).

The kernels honour the same exact-rewrite schedule variants as the
inference kernel (fused_decoder.PROD_VARIANTS is the default):

* ``sumrelu``    — relu(z+y) = max(z,-y)+y in the slot replay (the adjoint
  is unchanged: both forms share the (z+y > 0) subgradient mask).
* ``fold``       — wo@ua folded into one [MH, H] weight and (deg*bo)@ua
  into the aggregation bias; the fold products are taken in differentiable
  outer-JAX packing, so the kernel computes gradients w.r.t. the FOLDED
  operands and autodiff un-folds them into dwo/dua/dbo.  Drops one GEMM
  per direction from the replay AND two from the adjoint chain.
* ``interleave`` — both directions' slot loops (replay and adjoint) merged
  so independent MXU and VPU work is adjacent for the scheduler.

The custom_vjp core takes f32 params/states and casts to the compute dtype
inside (so AD sees f32 cotangents; standard mixed-precision practice), and
closes over the non-differentiable graph operators.  Everything around the
core — weight packing, degree x bias folding, syndrome-term product,
batch<->tile transposes — is plain JAX and differentiates automatically.

Gradients are validated against jax.grad through fused_decoder.rounds_xla
(tests/kernels/test_fused_backward.py), for the promoted variant schedule
and the base schedule alike.

Reference provenance: the reference trains by torch autograd replaying
gather/scatter transposed [SURVEY.md §3.1 "autograd replays gather/scatter
transposed"]; this is that transpose, hand-fused on the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugnn.kernels import fused_decoder as fd
from tpugnn.kernels.fused_decoder import (
    RoundWeights,
    make_operators,
    pack_weights,
    prep_operators,
)

__all__ = ["make_kernel_vjp_rounds", "kernel_trained_rounds",
           "kernel_trained_rounds_tiled", "train_block_batch"]

f32 = jnp.float32

# Training kernels get their own scoped-VMEM limit: the round-state stash
# grows with R, and the 64 MB inference default forces tiny tiles (R=14
# fell to TB=4 -> 403 ms/step).  112 MB holds TB=16 at R=8 / TB=8 at R=14 —
# both compiled AND ran on v5e (runs/probe_train_r8_tb16.json: 133.4 ms;
# runs/probe_train_r14_tb8.json: 227.8 ms, 1.77x the TB=4 step).
import os as _os

_TRAIN_VMEM_LIMIT = int(
    _os.environ.get("TPUGNN_TRAIN_VMEM_LIMIT_MB", 112)) * 1024 * 1024


def _dot2(a, b):
    # a: [rows, TB, K] x b: [K, F] -> [rows, TB, F] (f32 accum)
    r = jnp.dot(a.reshape(-1, a.shape[-1]), b, preferred_element_type=f32)
    return r.reshape(a.shape[0], a.shape[1], b.shape[-1])


def _dot2T(a, b):
    # a: [rows, TB, F] x b^T, b: [K, F] -> [rows, TB, K]
    r = jax.lax.dot_general(
        a.reshape(-1, a.shape[-1]), b, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    return r.reshape(a.shape[0], a.shape[1], b.shape[0])


def _wgrad(x, dy):
    # x: [rows, TB, K], dy: [rows, TB, F] -> [K, F] (contract rows*TB)
    return jax.lax.dot_general(
        x.reshape(-1, x.shape[-1]), dy.reshape(-1, dy.shape[-1]),
        (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )


def _gdot(g, y):
    # g: [rows, src] x y: [src, TB, F] -> [rows, TB, F]
    r = jnp.dot(g, y.reshape(y.shape[0], -1), preferred_element_type=f32)
    return r.reshape(g.shape[0], y.shape[1], y.shape[2])


def _rsum(x):
    # [rows, TB, F] -> [1, F] full reduction over rows and batch tile
    return jnp.sum(x.reshape(-1, x.shape[-1]), axis=0, keepdims=True)


def _unpack_w2(w2, MH, H, fold):
    """Slice the packed second-stage weights (layout depends on fold)."""
    wo_c, wo_q = w2[0:MH], w2[MH:2 * MH]
    if fold:
        # wo_* already carry the @ua projection; the ua slots don't exist
        uc_a = uq_a = None
        uc_w1, uq_w1 = w2[2 * MH:2 * MH + H], w2[2 * MH + H:2 * MH + 2 * H]
    else:
        uc_a, uq_a = w2[2 * MH:2 * MH + H], w2[2 * MH + H:2 * MH + 2 * H]
        uc_w1 = w2[2 * MH + 2 * H:2 * MH + 3 * H]
        uq_w1 = w2[2 * MH + 3 * H:2 * MH + 4 * H]
    return wo_c, wo_q, uc_a, uq_a, uc_w1, uq_w1


def _round_fwd(xc, xq, consts, *, want_residuals: bool, ablate=frozenset()):
    """One round's forward from cdt states; mirrors fused_decoder's kernel
    (including its exact-rewrite schedule variants).

    Returns (xc_new, xq_new) and, when ``want_residuals``, the f32/cdt
    intermediates the adjoint consumes.
    """
    (g_c, defc_c, degbo_c, g_q, defc_q, degbo_q,
     wproj_c, wproj_q, w2, bmh, bh, syn_ucs, MH, H, Dc, Dq, cdt) = consts
    fold = "fold" in ablate
    use_max = "sumrelu" in ablate
    wo_c, wo_q, uc_a, uq_a, uc_w1, uq_w1 = _unpack_w2(w2, MH, H, fold)
    b0_c, b0_q = bmh[0:1], bmh[1:2]
    uc_b0, uc_b1, uq_b0, uq_b1 = bh[0:1], bh[1:2], bh[2:3], bh[3:4]
    lnc_s, lnc_b, lnq_s, lnq_b = bh[4:5], bh[5:6], bh[6:7], bh[7:8]

    yc = _dot2(xc, wproj_c)
    yq = _dot2(xq, wproj_q)
    ydb_c = yc[..., :MH] + b0_c
    ys_c = yq[..., :MH].astype(cdt)
    ydb_q = yq[..., MH:2*MH] + b0_q
    ys_q = yc[..., MH:2*MH].astype(cdt)
    xc_ux = yc[..., 2*MH:]
    xq_ux = yq[..., 2*MH:]

    def term(g_k, ys, ydb, nydb, masks):
        zk = _gdot(g_k, ys)
        if masks is not None:
            # the slot relu's subgradient mask, saved for the adjoint so it
            # does not redo this gather GEMM just to rebuild the mask (the
            # sumrelu rewrite shares the same (zk + ydb > 0) condition:
            # max(zk, -ydb) is non-constant in zk exactly when zk > -ydb).
            # Stored in the compute dtype: exactly 0.0/1.0 either way, and
            # cdt halves the masks' VMEM so the batch tile stays at the
            # pre-mask size.
            masks.append(((zk + ydb) > 0).astype(cdt))
        if use_max:
            return jnp.maximum(zk, nydb)
        return jax.nn.relu(zk + ydb)

    def fin(hs, ydb, defc, d):
        if use_max:
            # relu(z+y) == max(z,-y) + y: the hoisted +ydb sum lands here
            # once, with the same pad-slot correction
            return hs + jnp.float32(d) * ydb - defc * jax.nn.relu(ydb)
        return hs - defc * jax.nn.relu(ydb)

    nydb_c = -ydb_c if use_max else None
    nydb_q = -ydb_q if use_max else None
    masks_c = [] if want_residuals else None
    masks_q = [] if want_residuals else None
    if "interleave" in ablate:
        hs_c = hs_q = None
        for k in range(max(Dc, Dq)):
            if k < Dc:
                t = term(g_c[k], ys_c, ydb_c, nydb_c, masks_c)
                hs_c = t if hs_c is None else hs_c + t
            if k < Dq:
                t = term(g_q[k], ys_q, ydb_q, nydb_q, masks_q)
                hs_q = t if hs_q is None else hs_q + t
    else:
        hs_c = hs_q = None
        for k in range(Dc):
            t = term(g_c[k], ys_c, ydb_c, nydb_c, masks_c)
            hs_c = t if hs_c is None else hs_c + t
        for k in range(Dq):
            t = term(g_q[k], ys_q, ydb_q, nydb_q, masks_q)
            hs_q = t if hs_q is None else hs_q + t
    hs_c = fin(hs_c, ydb_c, defc_c, Dc).astype(cdt)
    hs_q = fin(hs_q, ydb_q, defc_q, Dq).astype(cdt)

    if fold:
        # wo_* are folded wo@ua, degbo_* are folded (deg*bo)@ua: the
        # aggregation lands directly in the update pre-activation
        agg_c = agg_q = None
        t_c = xc_ux + (_dot2(hs_c, wo_c) + degbo_c) + syn_ucs + uc_b0
        t_q = xq_ux + (_dot2(hs_q, wo_q) + degbo_q) + uq_b0
    else:
        agg_c = (_dot2(hs_c, wo_c) + degbo_c).astype(cdt)
        agg_q = (_dot2(hs_q, wo_q) + degbo_q).astype(cdt)
        t_c = xc_ux + _dot2(agg_c, uc_a) + syn_ucs + uc_b0
        t_q = xq_ux + _dot2(agg_q, uq_a) + uq_b0
    hc = jax.nn.relu(t_c).astype(cdt)
    pre_c = xc.astype(f32) + _dot2(hc, uc_w1) + uc_b1
    hq = jax.nn.relu(t_q).astype(cdt)
    pre_q = xq.astype(f32) + _dot2(hq, uq_w1) + uq_b1

    def ln(p, s, b):
        mu = jnp.mean(p, axis=-1, keepdims=True)
        ctr = p - mu
        inv = jax.lax.rsqrt(jnp.mean(ctr * ctr, axis=-1, keepdims=True) + 1e-6)
        nh = ctr * inv
        return nh * s + b, nh, inv

    yc_new, nh_c, inv_c = ln(pre_c, lnc_s, lnc_b)
    yq_new, nh_q, inv_q = ln(pre_q, lnq_s, lnq_b)
    out = (yc_new.astype(cdt), yq_new.astype(cdt))
    if not want_residuals:
        return out
    res = (ydb_c, ys_c, ydb_q, ys_q, hs_c, agg_c, t_c, hc, nh_c, inv_c,
           hs_q, agg_q, t_q, hq, nh_q, inv_q,
           tuple(masks_c), tuple(masks_q))
    return out, res


def _make_fwd_kernel(M, N, Dc, Dq, H, MH, R, TB, cdt, ablate=frozenset(),
                     unroll_rounds: bool = False):
    """Forward+stash kernel.  Default rolls the round loop into a
    ``lax.fori_loop`` with dynamic stash indexing — Mosaic compiles the
    round body ONCE instead of R inlined copies (the R=14 static unroll
    pushed whole-program compiles past 30 min through the tunnel); pass
    ``unroll_rounds=True`` for the original fully-unrolled schedule."""

    def kernel(xc_ref, xq_ref, syn_ref,
               g_c_ref, defc_c_ref, degbo_c_ref, g_q_ref, defc_q_ref,
               degbo_q_ref, wproj_c_ref, wproj_q_ref, w2_ref, bmh_ref, bh_ref,
               out_xc_ref, out_xq_ref, stash_c_ref, stash_q_ref):
        consts = (
            g_c_ref[:], defc_c_ref[:], degbo_c_ref[:],
            g_q_ref[:], defc_q_ref[:], degbo_q_ref[:],
            wproj_c_ref[:], wproj_q_ref[:], w2_ref[:], bmh_ref[:], bh_ref[:],
            syn_ref[0].astype(f32), MH, H, Dc, Dq, cdt,
        )
        xc, xq = xc_ref[0], xq_ref[0]
        if unroll_rounds:
            for r in range(R):
                stash_c_ref[0, r] = xc
                stash_q_ref[0, r] = xq
                xc, xq = _round_fwd(xc, xq, consts, want_residuals=False,
                                    ablate=ablate)
        else:
            def body(r, carry):
                xc, xq = carry
                stash_c_ref[0, pl.dslice(r, 1)] = xc[None]
                stash_q_ref[0, pl.dslice(r, 1)] = xq[None]
                return _round_fwd(xc, xq, consts, want_residuals=False,
                                  ablate=ablate)

            xc, xq = jax.lax.fori_loop(0, R, body, (xc, xq))
        out_xc_ref[0] = xc
        out_xq_ref[0] = xq

    return kernel


def _make_bwd_kernel(M, N, Dc, Dq, H, MH, R, TB, cdt, ablate=frozenset(),
                     unroll_rounds: bool = False):
    """Backward kernel.  Default rolls the reverse-round walk into a
    ``lax.fori_loop`` (dynamic stash reads, all accumulators in the loop
    carry) so Mosaic compiles the adjoint body once instead of R inlined
    copies; ``unroll_rounds=True`` restores the original static unroll."""
    fold = "fold" in ablate
    interleave = "interleave" in ablate

    def kernel(stash_c_ref, stash_q_ref, syn_ref, dxc_o_ref, dxq_o_ref,
               g_c_ref, gT_c_ref, defc_c_ref, degbo_c_ref,
               g_q_ref, gT_q_ref, defc_q_ref, degbo_q_ref,
               wproj_c_ref, wproj_q_ref, w2_ref, bmh_ref, bh_ref,
               dxc_ref, dxq_ref, dsyn_ref,
               dwproj_c_ref, dwproj_q_ref, dw2_ref, dbmh_ref, dbh_ref,
               ddegbo_c_ref, ddegbo_q_ref):
        g_c, gT_c, defc_c = g_c_ref[:], gT_c_ref[:], defc_c_ref[:]
        g_q, gT_q, defc_q = g_q_ref[:], gT_q_ref[:], defc_q_ref[:]
        degbo_c, degbo_q = degbo_c_ref[:], degbo_q_ref[:]
        wproj_c, wproj_q, w2 = wproj_c_ref[:], wproj_q_ref[:], w2_ref[:]
        bmh, bh = bmh_ref[:], bh_ref[:]
        syn_ucs = syn_ref[0].astype(f32)
        consts = (g_c, defc_c, degbo_c, g_q, defc_q, degbo_q,
                  wproj_c, wproj_q, w2, bmh, bh, syn_ucs, MH, H, Dc, Dq, cdt)
        wo_c, wo_q, uc_a, uq_a, uc_w1, uq_w1 = _unpack_w2(w2, MH, H, fold)
        lnc_s, lnq_s = bh[4:5], bh[6:7]

        # grad accumulators (weight grads also accumulate ACROSS grid steps
        # into revisited output blocks — zeroed once at program 0)
        @pl.when(pl.program_id(0) == 0)
        def _init():
            for ref in (dwproj_c_ref, dwproj_q_ref, dw2_ref, dbmh_ref,
                        dbh_ref, ddegbo_c_ref, ddegbo_q_ref):
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

        def reverse_round(xc, xq, d_xc, d_xq):
            """One reverse round: replay the forward from the stashed
            round-input states, chain the adjoint.  Returns the new state
            cotangents plus this round's accumulator increments."""
            _, res = _round_fwd(xc, xq, consts, want_residuals=True,
                                ablate=ablate)
            (ydb_c, ys_c, ydb_q, ys_q, hs_c, agg_c, t_c, hc, nh_c, inv_c,
             hs_q, agg_q, t_q, hq, nh_q, inv_q, masks_c, masks_q) = res

            def ln_bwd(dy, nh, inv, scale):
                dnh = dy * scale
                m1 = jnp.mean(dnh, axis=-1, keepdims=True)
                m2 = jnp.mean(dnh * nh, axis=-1, keepdims=True)
                return inv * (dnh - m1 - nh * m2)

            dbh = [None] * 8
            # --- LayerNorm + residual-MLP adjoint (check side) ------------
            dbh[4] = _rsum(d_xc * nh_c)               # lnc_scale
            dbh[5] = _rsum(d_xc)                      # lnc_bias
            dpre_c = ln_bwd(d_xc, nh_c, inv_c, lnc_s)
            dxc_acc = dpre_c                          # residual into xc_r
            dpre_c_cdt = dpre_c.astype(cdt)
            duc_w1 = _wgrad(hc, dpre_c_cdt)
            dbh[1] = _rsum(dpre_c)                    # uc_b1
            dhc = _dot2T(dpre_c_cdt, uc_w1)
            dt_c = dhc * (t_c > 0)
            dt_c_cdt = dt_c.astype(cdt)
            dsyn = dt_c
            dbh[0] = _rsum(dt_c)                      # uc_b0
            if fold:
                # aggregation feeds pre_c directly: dt_c IS the folded-agg
                # cotangent (no ua chain; ddegbo accumulates the folded bias)
                duc_a = None
                ddegbo_c = jnp.sum(dt_c, axis=1, keepdims=True)
                dwo_c = _wgrad(hs_c, dt_c_cdt)
                dhs_c = _dot2T(dt_c_cdt, wo_c)
            else:
                duc_a = _wgrad(agg_c, dt_c_cdt)
                dagg_c = _dot2T(dt_c_cdt, uc_a)
                ddegbo_c = jnp.sum(dagg_c, axis=1, keepdims=True)
                dagg_c_cdt = dagg_c.astype(cdt)
                dwo_c = _wgrad(hs_c, dagg_c_cdt)
                dhs_c = _dot2T(dagg_c_cdt, wo_c)

            # --- (qubit side) ---------------------------------------------
            dbh[6] = _rsum(d_xq * nh_q)               # lnq_scale
            dbh[7] = _rsum(d_xq)                      # lnq_bias
            dpre_q = ln_bwd(d_xq, nh_q, inv_q, lnq_s)
            dxq_acc = dpre_q
            dpre_q_cdt = dpre_q.astype(cdt)
            duq_w1 = _wgrad(hq, dpre_q_cdt)
            dbh[3] = _rsum(dpre_q)                    # uq_b1
            dhq = _dot2T(dpre_q_cdt, uq_w1)
            dt_q = dhq * (t_q > 0)
            dt_q_cdt = dt_q.astype(cdt)
            dbh[2] = _rsum(dt_q)                      # uq_b0
            if fold:
                duq_a = None
                ddegbo_q = jnp.sum(dt_q, axis=1, keepdims=True)
                dwo_q = _wgrad(hs_q, dt_q_cdt)
                dhs_q = _dot2T(dt_q_cdt, wo_q)
            else:
                duq_a = _wgrad(agg_q, dt_q_cdt)
                dagg_q = _dot2T(dt_q_cdt, uq_a)
                ddegbo_q = jnp.sum(dagg_q, axis=1, keepdims=True)
                dagg_q_cdt = dagg_q.astype(cdt)
                dwo_q = _wgrad(hs_q, dagg_q_cdt)
                dhs_q = _dot2T(dagg_q_cdt, wo_q)

            # --- slot-gather adjoint (scatter = gather^T).  The replay
            # already evaluated every slot gather; its saved subgradient
            # masks mean the adjoint does ONLY the transposed scatter GEMMs
            # instead of re-doing each gather to rebuild the mask — a third
            # of the backward's slot-GEMM work.  The sumrelu rewrite shares
            # the mask, so the adjoint stays schedule-independent;
            # interleave merges both directions' loops for MXU/VPU overlap.
            dydb_c = -defc_c * (ydb_c > 0).astype(f32) * dhs_c
            dydb_q = -defc_q * (ydb_q > 0).astype(f32) * dhs_q
            dys_c = jnp.zeros((N, TB, MH), f32)
            dys_q = jnp.zeros((M, TB, MH), f32)
            if interleave:
                for k in range(max(Dc, Dq)):
                    if k < Dc:
                        dz = dhs_c * masks_c[k]
                        dydb_c = dydb_c + dz
                        dys_c = dys_c + _gdot(gT_c[k], dz.astype(cdt))
                    if k < Dq:
                        dz = dhs_q * masks_q[k]
                        dydb_q = dydb_q + dz
                        dys_q = dys_q + _gdot(gT_q[k], dz.astype(cdt))
            else:
                for k in range(Dc):
                    dz = dhs_c * masks_c[k]
                    dydb_c = dydb_c + dz
                    dys_c = dys_c + _gdot(gT_c[k], dz.astype(cdt))
                for k in range(Dq):
                    dz = dhs_q * masks_q[k]
                    dydb_q = dydb_q + dz
                    dys_q = dys_q + _gdot(gT_q[k], dz.astype(cdt))
            dbmh = jnp.concatenate([_rsum(dydb_c), _rsum(dydb_q)], axis=0)

            # --- wide projection adjoint (lane order mirrors the packs:
            # yc = [ydb_c | ys_q | xc@uc_x], yq = [ys_c | ydb_q | xq@uq_x])
            dyc = jnp.concatenate([dydb_c, dys_q, dt_c], axis=-1)
            dyq = jnp.concatenate([dys_c, dydb_q, dt_q], axis=-1)
            dyc_cdt = dyc.astype(cdt)
            dyq_cdt = dyq.astype(cdt)
            dwproj_c = _wgrad(xc, dyc_cdt)
            dwproj_q = _wgrad(xq, dyq_cdt)
            d_xc_new = dxc_acc + _dot2T(dyc_cdt, wproj_c)
            d_xq_new = dxq_acc + _dot2T(dyq_cdt, wproj_q)
            inc = (dsyn, dwproj_c, dwproj_q, dwo_c, dwo_q, duc_w1, duq_w1,
                   duc_a, duq_a, dbmh, tuple(dbh), ddegbo_c, ddegbo_q)
            return d_xc_new, d_xq_new, inc

        d_xc0 = dxc_o_ref[0]           # f32 [M, TB, H]
        d_xq0 = dxq_o_ref[0]

        def zero_acc():
            z = lambda *s: jnp.zeros(s, f32)
            return (z(M, TB, H),                       # dsyn
                    jnp.zeros(dwproj_c_ref.shape, f32),
                    jnp.zeros(dwproj_q_ref.shape, f32),
                    z(MH, H), z(MH, H),                # dwo_c, dwo_q
                    z(H, H), z(H, H),                  # duc_w1, duq_w1
                    None if fold else z(H, H),         # duc_a
                    None if fold else z(H, H),         # duq_a
                    z(2, MH),                          # dbmh
                    tuple(z(1, H) for _ in range(8)),  # dbh
                    z(M, 1, H), z(N, 1, H))            # ddegbo_c/q

        def add_acc(acc, inc):
            def add(a, b):
                if a is None:
                    return None
                if isinstance(a, tuple):
                    return tuple(x + y for x, y in zip(a, b))
                return a + b

            return tuple(add(a, b) for a, b in zip(acc, inc))

        if unroll_rounds:
            d_xc, d_xq = d_xc0, d_xq0
            acc = zero_acc()
            for r in range(R - 1, -1, -1):
                xc = stash_c_ref[0, r]  # cdt round-input states
                xq = stash_q_ref[0, r]
                d_xc, d_xq, inc = reverse_round(xc, xq, d_xc, d_xq)
                acc = add_acc(acc, inc)
        else:
            # rolled: accumulators ride the fori_loop carry; fold's absent
            # duc_a/duq_a slots are dropped from the carry (None is not a
            # valid loop-carry leaf) and reinserted after the loop
            def strip(acc):
                return tuple(x for x in acc if x is not None)

            def unstrip(flat):
                flat = list(flat)
                out = []
                for proto in zero_acc():
                    out.append(None if proto is None else flat.pop(0))
                return tuple(out)

            def body(i, carry):
                r = R - 1 - i
                d_xc, d_xq, acc_flat = carry
                xc = stash_c_ref[0, pl.dslice(r, 1)][0]
                xq = stash_q_ref[0, pl.dslice(r, 1)][0]
                d_xc, d_xq, inc = reverse_round(xc, xq, d_xc, d_xq)
                acc = add_acc(unstrip(acc_flat), inc)
                return d_xc, d_xq, strip(acc)

            d_xc, d_xq, acc_flat = jax.lax.fori_loop(
                0, R, body, (d_xc0, d_xq0, strip(zero_acc())))
            acc = unstrip(acc_flat)

        (dsyn, dwproj_c, dwproj_q, dwo_c, dwo_q, duc_w1, duq_w1,
         duc_a, duq_a, dbmh, dbh, ddegbo_c, ddegbo_q) = acc

        dxc_ref[0] = d_xc
        dxq_ref[0] = d_xq
        dsyn_ref[0] = dsyn
        dwproj_c_ref[...] += dwproj_c
        dwproj_q_ref[...] += dwproj_q
        if fold:
            dw2_ref[...] += jnp.concatenate(
                [dwo_c, dwo_q, duc_w1, duq_w1], axis=0
            )
        else:
            dw2_ref[...] += jnp.concatenate(
                [dwo_c, dwo_q, duc_a, duq_a, duc_w1, duq_w1], axis=0
            )
        dbmh_ref[...] += dbmh
        dbh_ref[...] += jnp.concatenate(list(dbh), axis=0)
        ddegbo_c_ref[...] += ddegbo_c
        ddegbo_q_ref[...] += ddegbo_q

    return kernel


def make_kernel_vjp_rounds(
    graph_operators: tuple, *, rounds: int, compute_dtype: str = "bfloat16",
    interpret: bool | None = None,
    ablate: tuple | None = None, unroll_rounds: bool = False,
):
    """Differentiable tiled round-loop with Pallas forward AND backward.

    Returns ``core(xc_t, xq_t, syn_t, wproj_c, wproj_q, w2, bmh, bh,
    degbo_c, degbo_q) -> (xc_o, xq_o)`` over f32 tiled inputs (cast to the
    compute dtype inside), with a hand-written fused backward.  The graph
    operators (gather one-hots, pad-slot counts) are closed-over constants.

    ``ablate=None`` selects fused_decoder.PROD_VARIANTS (the promoted
    schedule); callers must pack w2/degbo to match (``fold`` in the set
    means the packed operands carry the folded wo@ua / (deg*bo)@ua values —
    kernel_trained_rounds does this in differentiable outer JAX).

    The batch tile is decided by the caller via the [nblk, rows, TB, H]
    input shapes (see train_block_batch).
    """
    g_c0, mask_c, deg_c, g_q0, mask_q, deg_q = graph_operators
    cdt = jnp.dtype(compute_dtype)
    m = deg_c.shape[0]
    n = deg_q.shape[0]
    dc = g_c0.shape[0] // m
    dq = g_q0.shape[0] // n
    if ablate is None:
        ablate = fd.PROD_VARIANTS
    ablate = frozenset(ablate)
    fold = "fold" in ablate
    # slot-major gather operators + their transposes (scatter = gather^T)
    g_c = g_c0.reshape(m, dc, -1).transpose(1, 0, 2).astype(cdt)
    g_q = g_q0.reshape(n, dq, -1).transpose(1, 0, 2).astype(cdt)
    gT_c = g_c.transpose(0, 2, 1)
    gT_q = g_q.transpose(0, 2, 1)
    defc_c_row = (dc - deg_c).reshape(-1, 1, 1).astype(f32)
    defc_q_row = (dq - deg_q).reshape(-1, 1, 1).astype(f32)
    R = rounds

    def _interp():
        return jax.default_backend() != "tpu" if interpret is None else interpret

    @jax.custom_vjp
    def core(xc_t, xq_t, syn_t, wproj_c, wproj_q, w2, bmh, bh, degbo_c, degbo_q):
        out, _ = _fwd(xc_t, xq_t, syn_t, wproj_c, wproj_q, w2, bmh, bh,
                      degbo_c, degbo_q)
        return out

    def _fwd(xc_t, xq_t, syn_t, wproj_c, wproj_q, w2, bmh, bh, degbo_c, degbo_q):
        nblk, _, tb, h = xc_t.shape
        mh = bmh.shape[1]
        defc_c = jnp.broadcast_to(defc_c_row, (m, 1, mh))
        defc_q = jnp.broadcast_to(defc_q_row, (n, 1, mh))
        kern = _make_fwd_kernel(m, n, dc, dq, h, mh, R, tb, cdt, ablate=ablate,
                                unroll_rounds=unroll_rounds)
        full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
        tile = lambda rows, f: pl.BlockSpec((1, rows, tb, f),
                                            lambda i: (i, 0, 0, 0),
                                            memory_space=pltpu.VMEM)
        stash_spec = lambda rows, f: pl.BlockSpec(
            (1, R, rows, tb, f), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        ops = (g_c, defc_c, degbo_c, g_q, defc_q, degbo_q)
        packs = (wproj_c.astype(cdt), wproj_q.astype(cdt), w2.astype(cdt),
                 bmh, bh)
        xc_o, xq_o, stash_c, stash_q = pl.pallas_call(
            kern,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_TRAIN_VMEM_LIMIT),
            out_shape=(
                jax.ShapeDtypeStruct((nblk, m, tb, h), cdt),
                jax.ShapeDtypeStruct((nblk, n, tb, h), cdt),
                jax.ShapeDtypeStruct((nblk, R, m, tb, h), cdt),
                jax.ShapeDtypeStruct((nblk, R, n, tb, h), cdt),
            ),
            grid_spec=pl.GridSpec(
                grid=(nblk,),
                in_specs=[tile(m, h), tile(n, h), tile(m, h),
                          *[full(o) for o in ops], *[full(x) for x in packs]],
                out_specs=(tile(m, h), tile(n, h),
                           stash_spec(m, h), stash_spec(n, h)),
            ),
            interpret=_interp(),
        )(xc_t.astype(cdt), xq_t.astype(cdt), syn_t.astype(cdt), *ops, *packs)
        out = (xc_o.astype(f32), xq_o.astype(f32))
        res = (stash_c, stash_q, syn_t.astype(cdt),
               wproj_c, wproj_q, w2, bmh, bh, degbo_c, degbo_q)
        return out, res

    def _bwd(res, cot):
        stash_c, stash_q, syn_cdt, wproj_c, wproj_q, w2, bmh, bh, \
            degbo_c, degbo_q = res
        dxc_o, dxq_o = cot
        nblk, _, _, tb, h = stash_c.shape
        mh = bmh.shape[1]
        defc_c = jnp.broadcast_to(defc_c_row, (m, 1, mh))
        defc_q = jnp.broadcast_to(defc_q_row, (n, 1, mh))
        kern = _make_bwd_kernel(m, n, dc, dq, h, mh, R, tb, cdt, ablate=ablate,
                                unroll_rounds=unroll_rounds)
        full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
        acc = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        tile = lambda rows, f: pl.BlockSpec((1, rows, tb, f),
                                            lambda i: (i, 0, 0, 0),
                                            memory_space=pltpu.VMEM)
        stash_spec = lambda rows, f: pl.BlockSpec(
            (1, R, rows, tb, f), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        ops = (g_c, gT_c, defc_c, degbo_c, g_q, gT_q, defc_q, degbo_q)
        packs = (wproj_c.astype(cdt), wproj_q.astype(cdt), w2.astype(cdt),
                 bmh, bh)
        wsz = 2 * mh + h
        w2_rows = 2 * mh + (2 if fold else 4) * h
        outs = pl.pallas_call(
            kern,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_TRAIN_VMEM_LIMIT),
            out_shape=(
                jax.ShapeDtypeStruct((nblk, m, tb, h), f32),   # dxc
                jax.ShapeDtypeStruct((nblk, n, tb, h), f32),   # dxq
                jax.ShapeDtypeStruct((nblk, m, tb, h), f32),   # dsyn
                jax.ShapeDtypeStruct((h, wsz), f32),           # dwproj_c
                jax.ShapeDtypeStruct((h, wsz), f32),           # dwproj_q
                jax.ShapeDtypeStruct((w2_rows, h), f32),       # dw2
                jax.ShapeDtypeStruct((2, mh), f32),            # dbmh
                jax.ShapeDtypeStruct((8, h), f32),             # dbh
                jax.ShapeDtypeStruct((m, 1, h), f32),          # ddegbo_c
                jax.ShapeDtypeStruct((n, 1, h), f32),          # ddegbo_q
            ),
            grid_spec=pl.GridSpec(
                grid=(nblk,),
                in_specs=[stash_spec(m, h), stash_spec(n, h), tile(m, h),
                          tile(m, h), tile(n, h),
                          *[full(o) for o in ops], *[full(x) for x in packs]],
                out_specs=(
                    tile(m, h), tile(n, h), tile(m, h),
                    acc(jnp.zeros((h, wsz))), acc(jnp.zeros((h, wsz))),
                    acc(jnp.zeros((w2_rows, h))),
                    acc(jnp.zeros((2, mh))), acc(jnp.zeros((8, h))),
                    acc(jnp.zeros((m, 1, h))), acc(jnp.zeros((n, 1, h))),
                ),
            ),
            interpret=_interp(),
        )(stash_c, stash_q, syn_cdt, dxc_o, dxq_o, *ops, *packs)
        (dxc, dxq, dsyn, dwproj_c, dwproj_q, dw2, dbmh, dbh,
         ddegbo_c, ddegbo_q) = outs
        return (dxc, dxq, dsyn, dwproj_c, dwproj_q, dw2, dbmh, dbh,
                ddegbo_c, ddegbo_q)

    core.defvjp(_fwd, _bwd)
    return core


def train_block_batch(operators: tuple, mh: int, compute_dtype, batch: int,
                      rounds: int, block_batch: int = 16) -> int:
    """Batch tile for the TRAINING kernels (tighter than inference).

    The backward's working set (~3x forward) + the round-state stash bound
    the tile.  The cdt per-slot subgradient masks the replay saves for the
    adjoint add ~0.3 slot-units (well inside the estimate's 8 MB headroom),
    so the coefficient matches the pre-mask calibration — at the flagship
    R=14 shape the tile boundary sits at 55/56 MB and any padding of the
    coefficient would needlessly halve TB.

    ``TPUGNN_TRAIN_TB`` overrides the auto pick (pair with
    ``TPUGNN_TRAIN_VMEM_LIMIT_MB`` — the env var these training kernels
    actually compile against [ADVICE r3] — the stash grows with R, so the
    R=14 shape drops to TB=4 under the default 64 MB limit while TB=8/16
    need the probed 100-112 MB scoped-VMEM budgets).
    """
    import os as _os

    tb_env = _os.environ.get("TPUGNN_TRAIN_TB")
    if tb_env:
        tb = int(tb_env)
        while batch % tb:
            tb //= 2
        return max(tb, 1)
    slots = max(operators[0].shape[0], operators[3].shape[0])
    cdt = jnp.dtype(compute_dtype)
    # budget against the TRAINING VMEM limit (112 MB default, hardware-
    # validated), not the inference one: holds TB=16 at R=8 / TB=8 at R=14
    # for the flagship shape instead of TB=8/TB=4
    budget = _TRAIN_VMEM_LIMIT - 8 * 1024 * 1024
    eff_slots = slots * (2 + rounds // 4)
    # block_batch is the caller's CAP (honored even below 16 — an explicit
    # small tile to bound memory/debug stays small [ADVICE r3]); the auto
    # search only shrinks from there to fit the VMEM budget
    tb = block_batch
    while tb > 1 and fd._VMEM_COEF * eff_slots * tb * mh * cdt.itemsize > budget:
        tb //= 2
    while batch % tb:
        tb //= 2
    return max(tb, 1)


def kernel_trained_rounds_tiled(
    operators: tuple, *, rounds: int, compute_dtype: str = "bfloat16",
    interpret: bool | None = None, ablate: tuple | None = None,
    unroll_rounds: bool = False,
):
    """Tiled-layout trainable core with fully kernel-backed VJP.

    ``f(xc_t, xq_t, s_pm_t, weights) -> (xc_o_t, xq_o_t)`` where the states
    are already in the kernel's [nblk, rows, TB, H] f32 layout and
    ``s_pm_t`` is the tiled +-1 syndrome feature [nblk, M, TB].  Callers
    that embed directly in the tiled layout (PallasDecoder's trainable
    tiled path) skip the four large state transposes — and, under grad,
    their adjoint transposes — that the [B, rows, H] wrapper pays.

    Weight packing, the degree x out-bias fold, and the syndrome x uc_s
    product stay in plain JAX and differentiate automatically.
    """
    if ablate is None:
        ablate = fd.PROD_VARIANTS
    fold = "fold" in ablate
    core = make_kernel_vjp_rounds(
        operators, rounds=rounds, compute_dtype=compute_dtype,
        interpret=interpret, ablate=tuple(ablate),
        unroll_rounds=unroll_rounds,
    )
    deg_c = operators[2]
    deg_q = operators[5]

    def f_t(xc_t, xq_t, s_pm_t, weights: RoundWeights):
        w = weights
        # f32 packing (differentiable; core casts to the compute dtype)
        wproj_c = jnp.concatenate([w.wd_c, w.ws_q, w.uc_x], axis=1)
        wproj_q = jnp.concatenate([w.ws_c, w.wd_q, w.uq_x], axis=1)
        if fold:
            w2 = jnp.concatenate(
                [w.wo_c @ w.uc_a, w.wo_q @ w.uq_a, w.uc_w1, w.uq_w1], axis=0
            )
            degbo_c = (deg_c.reshape(-1, 1, 1) * w.bo_c[0]) @ w.uc_a
            degbo_q = (deg_q.reshape(-1, 1, 1) * w.bo_q[0]) @ w.uq_a
        else:
            w2 = jnp.concatenate(
                [w.wo_c, w.wo_q, w.uc_a, w.uq_a, w.uc_w1, w.uq_w1], axis=0
            )
            degbo_c = deg_c.reshape(-1, 1, 1) * w.bo_c[0]
            degbo_q = deg_q.reshape(-1, 1, 1) * w.bo_q[0]
        bmh = jnp.concatenate([w.b0_c, w.b0_q], axis=0)
        bh = jnp.concatenate(
            [w.uc_b0, w.uc_b1, w.uq_b0, w.uq_b1,
             w.lnc_scale, w.lnc_bias, w.lnq_scale, w.lnq_bias], axis=0
        )
        syn_ucs = s_pm_t[..., None] * w.uc_s[0]          # [nblk, M, TB, H]
        return core(
            xc_t, xq_t, syn_ucs,
            wproj_c, wproj_q, w2, bmh, bh, degbo_c, degbo_q,
        )

    return f_t


def kernel_trained_rounds(
    operators: tuple, *, rounds: int, compute_dtype: str = "bfloat16",
    interpret: bool | None = None, block_batch: int = 16,
    ablate: tuple | None = None, unroll_rounds: bool = False,
):
    """(xc, xq, syn, weights) -> (xc_out, xq_out), fully kernel-backed VJP.

    Drop-in for fused_decoder.make_differentiable_rounds (same batch-layout
    signature over [B, rows, H] f32 states and a RoundWeights tree), but
    the backward is the hand-written fused kernel rather than rematerialized
    XLA.  Thin wrapper over kernel_trained_rounds_tiled adding the
    batch<->tile transposes (differentiable; the fold products' AD un-folds
    the kernel's folded-operand gradients into dwo/dua/dbo).
    """
    core_t = kernel_trained_rounds_tiled(
        operators, rounds=rounds, compute_dtype=compute_dtype,
        interpret=interpret, ablate=ablate, unroll_rounds=unroll_rounds,
    )

    def f(xc, xq, syn, weights: RoundWeights):
        b, m, h = xc.shape
        n = xq.shape[1]
        mh = weights.wd_c.shape[1]
        tb = train_block_batch(operators, mh, compute_dtype, b, rounds,
                               block_batch)
        nblk = b // tb

        def to_tiles(x, rows, feat):
            return x.reshape(nblk, tb, rows, feat).transpose(0, 2, 1, 3)

        s_pm_t = syn[..., 0].reshape(nblk, tb, m).transpose(0, 2, 1)
        xc_o, xq_o = core_t(
            to_tiles(xc, m, h), to_tiles(xq, n, h), s_pm_t, weights,
        )

        def from_tiles(x, rows, feat):
            return x.transpose(0, 2, 1, 3).reshape(b, rows, feat)

        return from_tiles(xc_o, m, h), from_tiles(xq_o, n, h)

    return f
