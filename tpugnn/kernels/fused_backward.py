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

The custom_vjp core takes f32 params/states and casts to the compute dtype
inside (so AD sees f32 cotangents; standard mixed-precision practice), and
closes over the non-differentiable graph operators.  Everything around the
core — weight packing, degree x bias folding, syndrome-term product,
batch<->tile transposes — is plain JAX and differentiates automatically.

Gradients are validated against jax.grad through fused_decoder.rounds_xla
(tests/kernels/test_fused_backward.py).

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

__all__ = ["make_kernel_vjp_rounds", "kernel_trained_rounds"]

f32 = jnp.float32


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


def _round_fwd(xc, xq, consts, *, want_residuals: bool):
    """One round's forward from cdt states; mirrors fused_decoder's kernel.

    Returns (xc_new, xq_new) and, when ``want_residuals``, the f32/cdt
    intermediates the adjoint consumes.
    """
    (g_c, defc_c, degbo_c, g_q, defc_q, degbo_q,
     wproj_c, wproj_q, w2, bmh, bh, syn_ucs, MH, H, Dc, Dq, cdt) = consts
    wo_c, wo_q = w2[0:MH], w2[MH:2*MH]
    uc_a, uq_a = w2[2*MH:2*MH+H], w2[2*MH+H:2*MH+2*H]
    uc_w1, uq_w1 = w2[2*MH+2*H:2*MH+3*H], w2[2*MH+3*H:2*MH+4*H]
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

    def slot_sum(g, ys, ydb, defc, d):
        hs = None
        for k in range(d):
            t = jax.nn.relu(_gdot(g[k], ys) + ydb)
            hs = t if hs is None else hs + t
        return hs - defc * jax.nn.relu(ydb)

    hs_c = slot_sum(g_c, ys_c, ydb_c, defc_c, Dc).astype(cdt)
    agg_c = (_dot2(hs_c, wo_c) + degbo_c).astype(cdt)
    hs_q = slot_sum(g_q, ys_q, ydb_q, defc_q, Dq).astype(cdt)
    agg_q = (_dot2(hs_q, wo_q) + degbo_q).astype(cdt)

    t_c = xc_ux + _dot2(agg_c, uc_a) + syn_ucs + uc_b0
    hc = jax.nn.relu(t_c).astype(cdt)
    pre_c = xc.astype(f32) + _dot2(hc, uc_w1) + uc_b1
    t_q = xq_ux + _dot2(agg_q, uq_a) + uq_b0
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
           hs_q, agg_q, t_q, hq, nh_q, inv_q)
    return out, res


def _make_fwd_kernel(M, N, Dc, Dq, H, MH, R, TB, cdt):
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
        for r in range(R):  # static unroll: stash writes need static indices
            stash_c_ref[0, r] = xc
            stash_q_ref[0, r] = xq
            xc, xq = _round_fwd(xc, xq, consts, want_residuals=False)
        out_xc_ref[0] = xc
        out_xq_ref[0] = xq

    return kernel


def _make_bwd_kernel(M, N, Dc, Dq, H, MH, R, TB, cdt):
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
        wo_c, wo_q = w2[0:MH], w2[MH:2*MH]
        uc_a, uq_a = w2[2*MH:2*MH+H], w2[2*MH+H:2*MH+2*H]
        uc_w1, uq_w1 = w2[2*MH+2*H:2*MH+3*H], w2[2*MH+3*H:2*MH+4*H]
        lnc_s, lnq_s = bh[4:5], bh[6:7]

        # grad accumulators (weight grads also accumulate ACROSS grid steps
        # into revisited output blocks — zeroed once at program 0)
        @pl.when(pl.program_id(0) == 0)
        def _init():
            for ref in (dwproj_c_ref, dwproj_q_ref, dw2_ref, dbmh_ref,
                        dbh_ref, ddegbo_c_ref, ddegbo_q_ref):
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

        d_xc = dxc_o_ref[0]            # f32 [M, TB, H]
        d_xq = dxq_o_ref[0]
        dsyn = jnp.zeros((M, TB, H), f32)
        dwproj_c = jnp.zeros(dwproj_c_ref.shape, f32)
        dwproj_q = jnp.zeros(dwproj_q_ref.shape, f32)
        dw2 = [jnp.zeros((MH, H), f32), jnp.zeros((MH, H), f32)] + [
            jnp.zeros((H, H), f32) for _ in range(4)
        ]
        dbmh = jnp.zeros((2, MH), f32)
        dbh = [jnp.zeros((1, H), f32) for _ in range(8)]
        ddegbo_c = jnp.zeros((M, 1, H), f32)
        ddegbo_q = jnp.zeros((N, 1, H), f32)

        for r in range(R - 1, -1, -1):  # static reverse unroll
            xc = stash_c_ref[0, r]      # cdt round-input states
            xq = stash_q_ref[0, r]
            _, res = _round_fwd(xc, xq, consts, want_residuals=True)
            (ydb_c, ys_c, ydb_q, ys_q, hs_c, agg_c, t_c, hc, nh_c, inv_c,
             hs_q, agg_q, t_q, hq, nh_q, inv_q) = res

            def ln_bwd(dy, nh, inv, scale):
                dnh = dy * scale
                m1 = jnp.mean(dnh, axis=-1, keepdims=True)
                m2 = jnp.mean(dnh * nh, axis=-1, keepdims=True)
                return inv * (dnh - m1 - nh * m2)

            # --- LayerNorm + residual-MLP adjoint (check side) ------------
            dbh[4] += _rsum(d_xc * nh_c)              # lnc_scale
            dbh[5] += _rsum(d_xc)                     # lnc_bias
            dpre_c = ln_bwd(d_xc, nh_c, inv_c, lnc_s)
            dxc_acc = dpre_c                          # residual into xc_r
            dpre_c_cdt = dpre_c.astype(cdt)
            dw2[4] += _wgrad(hc, dpre_c_cdt)          # uc_w1
            dbh[1] += _rsum(dpre_c)                   # uc_b1
            dhc = _dot2T(dpre_c_cdt, uc_w1)
            dt_c = dhc * (t_c > 0)
            dt_c_cdt = dt_c.astype(cdt)
            dsyn += dt_c
            dbh[0] += _rsum(dt_c)                     # uc_b0
            dw2[2] += _wgrad(agg_c, dt_c_cdt)         # uc_a
            dagg_c = _dot2T(dt_c_cdt, uc_a)
            ddegbo_c += jnp.sum(dagg_c, axis=1, keepdims=True)
            dagg_c_cdt = dagg_c.astype(cdt)
            dw2[0] += _wgrad(hs_c, dagg_c_cdt)        # wo_c
            dhs_c = _dot2T(dagg_c_cdt, wo_c)

            # --- (qubit side) ---------------------------------------------
            dbh[6] += _rsum(d_xq * nh_q)              # lnq_scale
            dbh[7] += _rsum(d_xq)                     # lnq_bias
            dpre_q = ln_bwd(d_xq, nh_q, inv_q, lnq_s)
            dxq_acc = dpre_q
            dpre_q_cdt = dpre_q.astype(cdt)
            dw2[5] += _wgrad(hq, dpre_q_cdt)          # uq_w1
            dbh[3] += _rsum(dpre_q)                   # uq_b1
            dhq = _dot2T(dpre_q_cdt, uq_w1)
            dt_q = dhq * (t_q > 0)
            dt_q_cdt = dt_q.astype(cdt)
            dbh[2] += _rsum(dt_q)                     # uq_b0
            dw2[3] += _wgrad(agg_q, dt_q_cdt)         # uq_a
            dagg_q = _dot2T(dt_q_cdt, uq_a)
            ddegbo_q += jnp.sum(dagg_q, axis=1, keepdims=True)
            dagg_q_cdt = dagg_q.astype(cdt)
            dw2[1] += _wgrad(hs_q, dagg_q_cdt)        # wo_q
            dhs_q = _dot2T(dagg_q_cdt, wo_q)

            # --- slot-gather adjoint (recompute zk; scatter = gather^T) ----
            def slot_bwd(g, gT, ys, ydb, defc, dhs, d, src_rows):
                dydb = -defc * (ydb > 0).astype(f32) * dhs
                dys = jnp.zeros((src_rows, TB, MH), f32)
                for k in range(d):
                    zk = _gdot(g[k], ys)
                    dz = dhs * ((zk + ydb) > 0)
                    dydb = dydb + dz
                    dys = dys + _gdot(gT[k], dz.astype(cdt))
                return dydb, dys

            dydb_c, dys_c = slot_bwd(g_c, gT_c, ys_c, ydb_c, defc_c, dhs_c, Dc, N)
            dydb_q, dys_q = slot_bwd(g_q, gT_q, ys_q, ydb_q, defc_q, dhs_q, Dq, M)
            dbmh += jnp.concatenate([_rsum(dydb_c), _rsum(dydb_q)], axis=0)

            # --- wide projection adjoint (lane order mirrors the packs:
            # yc = [ydb_c | ys_q | xc@uc_x], yq = [ys_c | ydb_q | xq@uq_x])
            dyc = jnp.concatenate([dydb_c, dys_q, dt_c], axis=-1)
            dyq = jnp.concatenate([dys_c, dydb_q, dt_q], axis=-1)
            dyc_cdt = dyc.astype(cdt)
            dyq_cdt = dyq.astype(cdt)
            dwproj_c += _wgrad(xc, dyc_cdt)
            dwproj_q += _wgrad(xq, dyq_cdt)
            d_xc = dxc_acc + _dot2T(dyc_cdt, wproj_c)
            d_xq = dxq_acc + _dot2T(dyq_cdt, wproj_q)

        dxc_ref[0] = d_xc
        dxq_ref[0] = d_xq
        dsyn_ref[0] = dsyn
        dwproj_c_ref[...] += dwproj_c
        dwproj_q_ref[...] += dwproj_q
        dw2_ref[...] += jnp.concatenate(dw2, axis=0)
        dbmh_ref[...] += dbmh
        dbh_ref[...] += jnp.concatenate(dbh, axis=0)
        ddegbo_c_ref[...] += ddegbo_c
        ddegbo_q_ref[...] += ddegbo_q

    return kernel


def make_kernel_vjp_rounds(
    graph_operators: tuple, *, rounds: int, compute_dtype: str = "bfloat16",
    interpret: bool | None = None, block_batch: int = 8,
):
    """Differentiable tiled round-loop with Pallas forward AND backward.

    Returns ``core(xc_t, xq_t, syn_t, wproj_c, wproj_q, w2, bmh, bh,
    degbo_c, degbo_q) -> (xc_o, xq_o)`` over f32 tiled inputs (cast to the
    compute dtype inside), with a hand-written fused backward.  The graph
    operators (gather one-hots, pad-slot counts) are closed-over constants.

    ``block_batch`` defaults lower than inference: the backward's working
    set (~3x forward) plus the round-state stash bounds the tile.
    """
    g_c0, mask_c, deg_c, g_q0, mask_q, deg_q = graph_operators
    cdt = jnp.dtype(compute_dtype)
    m = deg_c.shape[0]
    n = deg_q.shape[0]
    dc = g_c0.shape[0] // m
    dq = g_q0.shape[0] // n
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
        kern = _make_fwd_kernel(m, n, dc, dq, h, mh, R, tb, cdt)
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
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=fd._VMEM_LIMIT),
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
        kern = _make_bwd_kernel(m, n, dc, dq, h, mh, R, tb, cdt)
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
        outs = pl.pallas_call(
            kern,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=fd._VMEM_LIMIT),
            out_shape=(
                jax.ShapeDtypeStruct((nblk, m, tb, h), f32),   # dxc
                jax.ShapeDtypeStruct((nblk, n, tb, h), f32),   # dxq
                jax.ShapeDtypeStruct((nblk, m, tb, h), f32),   # dsyn
                jax.ShapeDtypeStruct((h, wsz), f32),           # dwproj_c
                jax.ShapeDtypeStruct((h, wsz), f32),           # dwproj_q
                jax.ShapeDtypeStruct((2 * mh + 4 * h, h), f32),  # dw2
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
                    acc(jnp.zeros((2 * mh + 4 * h, h))),
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


def kernel_trained_rounds(
    operators: tuple, *, rounds: int, compute_dtype: str = "bfloat16",
    interpret: bool | None = None, block_batch: int = 8,
):
    """(xc, xq, syn, weights) -> (xc_out, xq_out), fully kernel-backed VJP.

    Drop-in for fused_decoder.make_differentiable_rounds (same batch-layout
    signature over [B, rows, H] f32 states and a RoundWeights tree), but
    the backward is the hand-written fused kernel rather than rematerialized
    XLA.  Weight packing, the degree x out-bias fold, the syndrome-term
    product, and the batch<->tile transposes stay in plain JAX and
    differentiate automatically.
    """
    core = make_kernel_vjp_rounds(
        operators, rounds=rounds, compute_dtype=compute_dtype,
        interpret=interpret,
    )
    deg_c = operators[2]
    deg_q = operators[5]
    cdt = jnp.dtype(compute_dtype)
    slots = max(operators[0].shape[0], operators[3].shape[0])

    def f(xc, xq, syn, weights: RoundWeights):
        b, m, h = xc.shape
        n = xq.shape[1]
        mh = weights.wd_c.shape[1]
        w = weights
        # f32 packing (differentiable; core casts to the compute dtype)
        wproj_c = jnp.concatenate([w.wd_c, w.ws_q, w.uc_x], axis=1)
        wproj_q = jnp.concatenate([w.ws_c, w.wd_q, w.uq_x], axis=1)
        w2 = jnp.concatenate(
            [w.wo_c, w.wo_q, w.uc_a, w.uq_a, w.uc_w1, w.uq_w1], axis=0
        )
        bmh = jnp.concatenate([w.b0_c, w.b0_q], axis=0)
        bh = jnp.concatenate(
            [w.uc_b0, w.uc_b1, w.uq_b0, w.uq_b1,
             w.lnc_scale, w.lnc_bias, w.lnq_scale, w.lnq_bias], axis=0
        )
        degbo_c = deg_c.reshape(-1, 1, 1) * w.bo_c[0]
        degbo_q = deg_q.reshape(-1, 1, 1) * w.bo_q[0]
        syn_ucs = syn * w.uc_s[0]                        # [B, M, H]

        # the backward's working set (~3x forward) + the round-state stash
        # bound the batch tile tighter than inference
        tb = fd.pick_block_batch(
            slots * (2 + rounds // 4), mh, cdt.itemsize, b, block_batch
        )
        nblk = b // tb

        def to_tiles(x, rows, feat):
            return x.reshape(nblk, tb, rows, feat).transpose(0, 2, 1, 3)

        xc_o, xq_o = core(
            to_tiles(xc, m, h), to_tiles(xq, n, h), to_tiles(syn_ucs, m, h),
            wproj_c, wproj_q, w2, bmh, bh, degbo_c, degbo_q,
        )

        def from_tiles(x, rows, feat):
            return x.transpose(0, 2, 1, 3).reshape(b, rows, feat)

        return from_tiles(xc_o, m, h), from_tiles(xq_o, n, h)

    return f
