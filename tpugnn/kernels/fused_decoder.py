"""Fully-fused R-round decoder kernel: the whole message-passing iteration
stays in VMEM.

The reference executes each round as a chain of device ops with every
intermediate round-tripping HBM (gather -> edge MLP -> scatter -> update,
SURVEY.md §3.3); even a well-fused XLA program writes inter-GEMM activations
([B, nodes, hidden]-sized, ~GBs at B=4096) back to HBM between rounds.  This
kernel grids over *samples* and runs ALL R rounds for one syndrome on-chip:

    per grid step (one sample):
      load  x_check [M, H], x_qubit [N, H], syndrome feature [M, 1]   (~130 KB)
      R x { 4 node GEMMs + 2 slot-gather GEMMs + masked slot-sum
            + 2 update MLPs + 2 LayerNorms }          all VMEM-resident
      store final node states                                          (~130 KB)

HBM traffic collapses to initial/final states (~260 KB/sample) regardless of
R — the "R rounds without HBM round-trips" win of SURVEY.md §7 PR3.  The
slot gather is expressed as a one-hot incidence matmul (MXU) instead of a
dynamic gather, using the same algebraic fusion as models.fused_cell (split
concat GEMM + aggregation-commutes-with-linear-layer), so the kernel is a
pure chain of small GEMMs + VPU elementwise ops.

Shapes are static per (graph, H, MH, R); d <= ~25 fits comfortably in the
~16 MB VMEM budget (d=11: < 3 MB resident).  Forward-only: training uses the
XLA 'fused' backend; decode/eval/bench use this kernel via backend='pallas'
(see models.decoder).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "RoundWeights", "decoder_rounds", "decoder_rounds_tiled", "make_operators",
    "rounds_xla", "make_differentiable_rounds", "pick_block_batch",
    "prep_operators", "pack_weights", "pad_msg_width",
]

# VMEM auto-sizing knobs (see decoder_rounds); module-level so perf probes
# can override them.  The coefficient is calibrated against the Mosaic
# compiler's own scoped-allocation reports on v5e (TB=16: 23.9 MB, TB=32:
# 41.8 MB for the d=11/H=128 kernel -> ~11-12 bytes per slot element);
# the 64 MB ceiling was validated on hardware (TB=32 compiles and runs).
import os as _os

# Env-overridable for hardware probes (e.g. TB=64 needs ~78 MB scoped VMEM,
# beyond the 64 MB validated on v5e so far): TPUGNN_VMEM_LIMIT_MB=100
_VMEM_LIMIT = int(_os.environ.get("TPUGNN_VMEM_LIMIT_MB", 64)) * 1024 * 1024
_VMEM_BUDGET = _VMEM_LIMIT - 8 * 1024 * 1024
_VMEM_COEF = 12.0

# Exact-rewrite kernel variants promoted to the production default after
# hardware attribution (benchmarks/probe_kernel_attrib.py).  Callers that
# pass ablate=None get these; ablate=() forces the original schedule (the
# parity tests diff the two).  Every key here MUST compute the same
# function as the base kernel (up to f32 reassociation).
#
# Promoted 2026-08-19 from runs/probe_attrib.json (v5e hardware): the combo
# measured 1.67x the base schedule.  Parity vs the base schedule is
# enforced by test_prod_variants_match_original_schedule.
#
# Re-promoted 2026-08-21 (runs/probe_ablate_r3.json, idle-host): biggather
# replaces interleave — sumrelu+fold+biggather measured 36.19 ms vs
# sumrelu+fold+interleave's 38.13 ms at the flagship shape (and pallas_bg
# won BENCH_r02 at 433.4 M edges/s).  The same probe's oneslot ablation
# (12.4 ms saved by dropping 6 of 8 slot GEMMs) shows the slot gather
# GEMMs ARE the dominant cost above the floor — the r1 conclusion that
# they no longer limit was wrong; see PERF_NOTES "Round 3" for the
# decomposition.  biggather overrides interleave inside the kernel, and
# the training replay (fused_backward._round_fwd) falls back to the plain
# slot loop for unknown keys — exact either way.
PROD_VARIANTS: tuple = ("sumrelu", "fold", "biggather")


def pick_block_batch(slots: int, mh: int, itemsize: int, batch: int,
                     block_batch: int = 32) -> int:
    """Largest batch tile fitting the VMEM budget (and dividing the batch)."""
    tb = block_batch
    while tb > 1 and _VMEM_COEF * slots * tb * mh * itemsize > _VMEM_BUDGET:
        tb //= 2
    while batch % tb:
        tb //= 2
    return max(tb, 1)


class RoundWeights(NamedTuple):
    """Weight-tied round parameters in kernel layout (all f32 2-D arrays)."""

    # message to checks: dst = check, src = qubit
    wd_c: jnp.ndarray   # [H, MH]
    ws_c: jnp.ndarray   # [H, MH]
    b0_c: jnp.ndarray   # [1, MH]
    wo_c: jnp.ndarray   # [MH, H]
    bo_c: jnp.ndarray   # [1, H]
    # message to qubits: dst = qubit, src = check
    wd_q: jnp.ndarray
    ws_q: jnp.ndarray
    b0_q: jnp.ndarray
    wo_q: jnp.ndarray
    bo_q: jnp.ndarray
    # check update MLP (input split: state / agg / syndrome)
    uc_x: jnp.ndarray   # [H, H]
    uc_a: jnp.ndarray   # [H, H]
    uc_s: jnp.ndarray   # [1, H]
    uc_b0: jnp.ndarray  # [1, H]
    uc_w1: jnp.ndarray  # [H, H]
    uc_b1: jnp.ndarray  # [1, H]
    # qubit update MLP (state / agg)
    uq_x: jnp.ndarray
    uq_a: jnp.ndarray
    uq_b0: jnp.ndarray
    uq_w1: jnp.ndarray
    uq_b1: jnp.ndarray
    # LayerNorms
    lnc_scale: jnp.ndarray  # [1, H]
    lnc_bias: jnp.ndarray
    lnq_scale: jnp.ndarray
    lnq_bias: jnp.ndarray


def pad_msg_width(w: RoundWeights, mh_pad: int) -> RoundWeights:
    """Pad the message width mh -> mh_pad with zeros (bit-exact).

    Mosaic only lowers the kernel's [src, TB, MH] <-> [src, TB*MH] shape
    casts when the merged lane dim is 128-aligned, so narrow models pad MH
    up to the lane width.  Exact: padded wd/ws columns and b0 lanes are
    zero, so every padded slot-lane carries relu(0 + 0) = 0 (sumrelu:
    max(0, -0) + 0 = 0) through the reduction, and the padded wo rows
    multiply those zero lanes by zero; since the pad occupies new lanes, no
    existing f32 sum is reassociated — outputs are bit-identical.
    """
    mh = w.wd_c.shape[1]
    if mh_pad == mh:
        return w
    padc = lambda a: jnp.pad(a, ((0, 0), (0, mh_pad - mh)))  # pad columns
    padr = lambda a: jnp.pad(a, ((0, mh_pad - mh), (0, 0)))  # pad rows
    return w._replace(
        wd_c=padc(w.wd_c), ws_c=padc(w.ws_c), b0_c=padc(w.b0_c),
        wo_c=padr(w.wo_c),
        wd_q=padc(w.wd_q), ws_q=padc(w.ws_q), b0_q=padc(w.b0_q),
        wo_q=padr(w.wo_q),
    )


def make_operators(graph):
    """Precompute the dense slot operators (XLA, once per trace).

    Returns (g_c [M*Dc, N], mask_c [M*Dc, 1], deg_c [M, 1],
             g_q [N*Dq, M], mask_q [N*Dq, 1], deg_q [N, 1]).
    """
    src_q = jnp.take(graph.edge_qubit, graph.ell_check_edge)      # [M, Dc]
    src_c = jnp.take(graph.edge_check, graph.ell_qubit_edge)      # [N, Dq]
    mc = graph.ell_check_mask.reshape(-1, 1)                      # [M*Dc, 1]
    mq = graph.ell_qubit_mask.reshape(-1, 1)
    g_c = jax.nn.one_hot(src_q.reshape(-1), graph.n_qubits_pad, dtype=jnp.float32) * mc
    g_q = jax.nn.one_hot(src_c.reshape(-1), graph.n_checks_pad, dtype=jnp.float32) * mq
    deg_c = jnp.sum(graph.ell_check_mask, axis=1, keepdims=True)  # [M, 1]
    deg_q = jnp.sum(graph.ell_qubit_mask, axis=1, keepdims=True)
    return g_c, mc, deg_c, g_q, mq, deg_q


def _ln(x, scale, bias):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _ln1pass(x, scale, bias):
    # One-pass statistics: var = E[x^2] - mu^2 (exact up to f32
    # reassociation; safe here because post-residual activations are O(1)).
    # Saves the second full read of x that the two-pass form's centered
    # square costs.
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    m2 = jnp.mean(x * x, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(m2 - mu * mu + 1e-6)
    return (x - mu) * r * scale + bias


def _make_kernel(M, N, Dc, Dq, H, MH, R, TB, cdt, ablate=frozenset()):
    """Batch-tiled kernel; activations laid out [rows, TB, F] so every GEMM
    contracts over a full [rows*TB, F] or [rows, TB*F] panel (MXU-friendly).

    ``cdt`` is the compute dtype (bf16 by default, f32 accumulation via
    preferred_element_type); LayerNorm statistics run in f32.

    ``ablate`` selects kernel variants for the perf attribution probe
    (benchmarks/probe_kernel_attrib.py).  Keys marked EXACT below compute
    the base function (up to f32 reassociation) and are promotion
    candidates (PROD_VARIANTS); every other key CHANGES THE COMPUTED
    FUNCTION and must never reach production paths:
      noslotrelu — drop the per-slot relu/add VPU passes (slot GEMMs kept)
      oneslot    — run a single gather slot per direction (D -> 1)
      noln       — LayerNorm without statistics (affine only)
      noupdate   — drop the update-MLP hidden GEMM + relu
      sumrelu    — EXACT alternative slot reduction: relu(z+y) rewritten as
                   max(z, -y) + y, hoisting the +ydb adds out of the slot
                   loop (one fma after it) — fewer VPU passes, same math
                   up to f32 sum reassociation
      fold       — EXACT (up to reassociation): the aggregation feeds only
                   the update MLP, so wo@ua folds into one [MH, H] weight
                   and deg*bo@ua into the bias operand — two GEMMs and two
                   bias adds fewer per round (prep/pack must be called with
                   fold=True so the w2/degbo operands carry folded values)
      interleave — EXACT: both directions' slot loops merged into one loop
                   so independent MXU (gather GEMM) and VPU (relu/acc) work
                   is adjacent in program order for the scheduler
      ln1pass    — EXACT (up to reassociation): LayerNorm statistics via
                   var = E[x^2] - mu^2 in one pass over x instead of the
                   centered two-pass form
      biasfold   — EXACT; requires 'fold': the update-MLP input biases
                   (uc_b0/uq_b0) are round-invariant, so prep_operators
                   folds them into the degbo_* aggregation constants — two
                   broadcast adds fewer per round
      biggather  — EXACT: all D slot gathers in one [D*rows, src] GEMM per
                   direction (the pre-slot-chunking layout) — amortizes MXU
                   pipeline fill across slots; costs a [D*rows, TB, MH]
                   live tensor, so pair with TB<=16.  Overrides interleave.
    """

    def dot2(a, b):
        # a: [rows, TB, K] x b: [K, F] -> [rows, TB, F]
        r = jnp.dot(
            a.reshape(-1, a.shape[-1]), b, preferred_element_type=jnp.float32
        )
        return r.reshape(a.shape[0], a.shape[1], b.shape[-1])

    def gdot(g, y):
        # g: [rows, src_rows] x y: [src_rows, TB, F] -> [rows, TB, F].
        # (Mosaic requires 32-bit matmul accumulators, so the one-hot
        # gather GEMM accumulates in f32 even though bf16 would be exact.)
        r = jnp.dot(
            g, y.reshape(y.shape[0], -1), preferred_element_type=jnp.float32
        )
        return r.reshape(g.shape[0], y.shape[1], y.shape[2])

    def kernel(
        xc_ref, xq_ref, syn_ucs_ref,
        g_c_ref, defc_c_ref, degbo_c_ref, g_q_ref, defc_q_ref, degbo_q_ref,
        wproj_c_ref, wproj_q_ref, w2_ref, bmh_ref, bh_ref,
        out_xc_ref, out_xq_ref,
    ):
        # Weight bundles arrive pre-packed and pre-cast (packing ~30 small
        # operands into 5 cuts per-grid-step DMA issue overhead; casting
        # outside removes per-grid-step VPU cast passes).  Static slices of
        # refs are free VMEM views.
        wproj_c = wproj_c_ref[:]       # cdt [H, 2MH+H]: [wd_c | ws_q | uc_x]
        wproj_q = wproj_q_ref[:]       # cdt [H, 2MH+H]: [ws_c | wd_q | uq_x]
        w2 = w2_ref[:]                 # cdt [2MH+4H, H]:
        #                                [wo_c | wo_q | uc_a | uq_a | uc_w1 | uq_w1]
        bmh = bmh_ref[:]               # f32 [2, MH]: b0_c, b0_q
        bh = bh_ref[:]                 # f32 [8, H]
        wo_c, wo_q = w2[0:MH], w2[MH:2*MH]
        uc_a, uq_a = w2[2*MH:2*MH+H], w2[2*MH+H:2*MH+2*H]
        uc_w1, uq_w1 = w2[2*MH+2*H:2*MH+3*H], w2[2*MH+3*H:2*MH+4*H]
        b0_c, b0_q = bmh[0:1], bmh[1:2]
        uc_b0, uc_b1, uq_b0, uq_b1 = bh[0:1], bh[1:2], bh[2:3], bh[3:4]
        lnc_s, lnc_b, lnq_s, lnq_b = bh[4:5], bh[5:6], bh[6:7], bh[7:8]

        xc0 = xc_ref[0]                # cdt [M, TB, H]
        xq0 = xq_ref[0]                # cdt [N, TB, H]
        # syndrome-feature term of the check update, pre-multiplied by the
        # uc_s weight row OUTSIDE the kernel (round-invariant); cast to f32
        # once — all VPU elementwise math runs in f32 (the VPU is f32-
        # native, so bf16 elementwise only added cast passes), with casts
        # to cdt only at MXU inputs.
        syn_ucs = syn_ucs_ref[0].astype(jnp.float32)  # [M, TB, H]
        g_c = g_c_ref[:]               # cdt [Dc, M, N] slot-major gather op
        g_q = g_q_ref[:]               # cdt [Dq, N, M]
        defc_c = defc_c_ref[:]         # f32 [M, 1, MH]: Dc - deg (pad-slot count)
        defc_q = defc_q_ref[:]         # f32 [N, 1, MH]
        degbo_c = degbo_c_ref[:]       # f32 [M, 1, H]: deg * b_out
        degbo_q = degbo_q_ref[:]

        use_max = "sumrelu" in ablate

        def slot_term(g_k, ys, ydb, nydb):
            """One gather GEMM + its VPU pass (see slot_final for the two
            algebraically-equal reduction forms)."""
            zk = gdot(g_k, ys)                           # f32 [rows, TB, MH]
            if "noslotrelu" in ablate:
                return zk
            if use_max:
                return jnp.maximum(zk, nydb)
            return jax.nn.relu(zk + ydb)

        def slot_final(hs, ydb, defc, d):
            if "noslotrelu" in ablate:
                return hs
            if use_max:
                # relu(z+y) == max(z,-y) + y: the hoisted +ydb sum lands
                # here once (D*ydb), with the same pad correction
                return hs + jnp.float32(d) * ydb - defc * jax.nn.relu(ydb)
            return hs - defc * jax.nn.relu(ydb)          # f32

        def slot_sum(g, ys, ydb, defc, d):
            # Mask-free slot-chunked gather+reduce: one [rows, src] x
            # [src, TB*MH] GEMM per slot k, consumed immediately (only one
            # [rows, TB, MH] slot tensor ever live — this is what lets TB
            # grow within the VMEM budget).  Padded slots have all-zero
            # gather rows, so they contribute exactly relu(ydb); instead of
            # a mask multiply per slot, subtract the correction
            # (D - deg) * relu(ydb) once (exact: zk == 0 on padded slots).
            if "oneslot" in ablate:
                d = 1
            nydb = -ydb if use_max else None
            if "biggather" in ablate and d > 1:
                # EXACT: all d slots in ONE [d*rows, src] x [src, TB*MH]
                # GEMM — a 4x-taller matmul amortizes MXU pipeline
                # fill/drain across slots at the cost of a [d*rows, TB, MH]
                # live tensor (the original pre-slot-chunking layout; fits
                # comfortably at TB<=16 under the 64 MB scoped limit).  The
                # VPU relu/accumulate passes stay per-slot via static
                # sublane slices, so the reduction order — and therefore
                # the f32 sum — is identical to the chunked form.
                rows = g.shape[1]
                zz = gdot(g.reshape(d * rows, g.shape[2]), ys)
                hs = None
                for k in range(d):
                    zk = zz[k * rows:(k + 1) * rows]
                    if "noslotrelu" in ablate:
                        t = zk
                    elif use_max:
                        t = jnp.maximum(zk, nydb)
                    else:
                        t = jax.nn.relu(zk + ydb)
                    hs = t if hs is None else hs + t
                return slot_final(hs, ydb, defc, d)
            hs = None
            for k in range(d):
                t = slot_term(g[k], ys, ydb, nydb)
                hs = t if hs is None else hs + t
            return slot_final(hs, ydb, defc, d)

        def slot_sum_interleaved(ys_c, ydb_c, ys_q, ydb_q):
            # Both directions in one loop: each iteration has a GEMM and a
            # VPU pass with no dependency between the two directions, so the
            # scheduler can overlap MXU and VPU work across them.
            dc = 1 if "oneslot" in ablate else Dc
            dq = 1 if "oneslot" in ablate else Dq
            nydb_c = -ydb_c if use_max else None
            nydb_q = -ydb_q if use_max else None
            hs_c = hs_q = None
            for k in range(max(dc, dq)):
                if k < dc:
                    t = slot_term(g_c[k], ys_c, ydb_c, nydb_c)
                    hs_c = t if hs_c is None else hs_c + t
                if k < dq:
                    t = slot_term(g_q[k], ys_q, ydb_q, nydb_q)
                    hs_q = t if hs_q is None else hs_q + t
            return (slot_final(hs_c, ydb_c, defc_c, dc),
                    slot_final(hs_q, ydb_q, defc_q, dq))

        def round_body(_, carry):
            xc, xq = carry                               # cdt
            # one wide projection GEMM per node type feeds both message
            # directions and the update MLP's state term
            yc = dot2(xc, wproj_c)                       # f32 [M, TB, 2MH+H]
            yq = dot2(xq, wproj_q)                       # f32 [N, TB, 2MH+H]
            ydb_c = yc[..., :MH] + b0_c                  # dst term, to checks
            ys_c = yq[..., :MH].astype(cdt)              # src term, to checks
            ydb_q = yq[..., MH:2*MH] + b0_q              # dst term, to qubits
            ys_q = yc[..., MH:2*MH].astype(cdt)          # src term, to qubits
            xc_ux = yc[..., 2*MH:]                       # xc @ uc_x (f32)
            xq_ux = yq[..., 2*MH:]                       # xq @ uq_x

            if "interleave" in ablate and "biggather" not in ablate:
                hs_c, hs_q = slot_sum_interleaved(ys_c, ydb_c, ys_q, ydb_q)
                hs_c = hs_c.astype(cdt)
                hs_q = hs_q.astype(cdt)
            else:
                # biggather overrides interleave: the single tall gather
                # GEMM per direction already gives the scheduler adjacent
                # independent MXU/VPU work
                hs_c = slot_sum(g_c, ys_c, ydb_c, defc_c, Dc).astype(cdt)
                hs_q = slot_sum(g_q, ys_q, ydb_q, defc_q, Dq).astype(cdt)
            if "fold" in ablate:
                # wo_c/wo_q hold the folded wo@ua weights and degbo_c/q the
                # folded deg*bo@ua biases (see prep_operators/pack_weights
                # fold=True); the aggregation lands directly in the update
                # MLP's pre-activation — no intermediate agg GEMM.
                agg_c = dot2(hs_c, wo_c) + degbo_c
                agg_q = dot2(hs_q, wo_q) + degbo_q
            else:
                agg_c = (dot2(hs_c, wo_c) + degbo_c).astype(cdt)
                agg_q = (dot2(hs_q, wo_q) + degbo_q).astype(cdt)

            # --- updates (residual MLP + LayerNorm, f32 VPU math) ---------
            if "noln" in ablate:
                ln = lambda x, s, b: x * s + b
            elif "ln1pass" in ablate:
                ln = _ln1pass
            else:
                ln = _ln
            if "noupdate" in ablate:
                xc_new = ln(
                    xc.astype(jnp.float32) + agg_c.astype(jnp.float32),
                    lnc_s, lnc_b,
                ).astype(cdt)
                xq_new = ln(
                    xq.astype(jnp.float32) + agg_q.astype(jnp.float32),
                    lnq_s, lnq_b,
                ).astype(cdt)
                return xc_new, xq_new
            if "biasfold" in ablate:
                # degbo_* already carries uc_b0/uq_b0 (prep_operators
                # biasfold=True), so the broadcast bias adds vanish
                pre_c = xc_ux + agg_c + syn_ucs
                pre_q = xq_ux + agg_q
            elif "fold" in ablate:
                # agg_* already carries the @ua projection (folded weights)
                pre_c = xc_ux + agg_c + syn_ucs + uc_b0
                pre_q = xq_ux + agg_q + uq_b0
            else:
                pre_c = xc_ux + dot2(agg_c, uc_a) + syn_ucs + uc_b0
                pre_q = xq_ux + dot2(agg_q, uq_a) + uq_b0
            hc = jax.nn.relu(pre_c).astype(cdt)
            xc_new = ln(
                xc.astype(jnp.float32) + dot2(hc, uc_w1) + uc_b1, lnc_s, lnc_b
            ).astype(cdt)
            hq = jax.nn.relu(pre_q).astype(cdt)
            xq_new = ln(
                xq.astype(jnp.float32) + dot2(hq, uq_w1) + uq_b1, lnq_s, lnq_b
            ).astype(cdt)
            return xc_new, xq_new

        xc, xq = jax.lax.fori_loop(0, R, round_body, (xc0, xq0))
        # outputs travel in the compute dtype (states are already cdt-
        # rounded, so this is lossless and halves the output IO buffers);
        # wrappers upcast to f32 outside the kernel
        out_xc_ref[0] = xc
        out_xq_ref[0] = xq

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "rounds", "interpret", "block_batch", "compute_dtype", "ablate"
    ),
)
def decoder_rounds(
    xc0: jnp.ndarray,     # [B, M, H]
    xq0: jnp.ndarray,     # [B, N, H]
    syn: jnp.ndarray,     # [B, M, 1]
    operators: tuple,     # from make_operators(graph)
    weights: RoundWeights,
    *,
    rounds: int,
    interpret: bool | None = None,
    block_batch: int = 32,
    compute_dtype: str = "bfloat16",
    ablate: tuple | None = None,
):
    """Run R fused message rounds; returns (xc_final, xq_final) in f32.

    The batch is tiled by ``block_batch``; within a tile activations are laid
    out [rows, TB, F] so the kernel's GEMMs contract full [rows, TB*F]
    panels.  ``compute_dtype`` selects bf16 (default, f32 accumulation) or
    f32 compute.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m, h = xc0.shape
    n = xq0.shape[1]
    g_c = operators[0]
    mh = -(-weights.wd_c.shape[1] // 128) * 128  # padded width (VMEM sizing)
    cdt = jnp.dtype(compute_dtype)
    slots = max(operators[0].shape[0], operators[3].shape[0])
    tb = pick_block_batch(slots, mh, cdt.itemsize, b, block_batch)
    nblk = b // tb

    # [B, rows, F] -> [nblk, rows, TB, F] (XLA transpose, amortized once);
    # input tiles travel in the compute dtype (halves the double-buffered
    # VMEM IO footprint in bf16); outputs stay f32
    def to_tiles(x, rows, f):
        return x.reshape(nblk, tb, rows, f).transpose(0, 2, 1, 3)

    xc_t = to_tiles(xc0.astype(cdt), m, h)
    xq_t = to_tiles(xq0.astype(cdt), n, h)
    # syndrome term of the check update, pre-multiplied by uc_s (outer
    # products with double sublane+lane broadcasts don't lower in bf16)
    syn_ucs = to_tiles((syn * weights.uc_s[0]).astype(cdt), m, h)

    xc_o, xq_o = decoder_rounds_tiled(
        xc_t, xq_t, syn_ucs, operators, weights,
        rounds=rounds, interpret=interpret, compute_dtype=compute_dtype,
        ablate=PROD_VARIANTS if ablate is None else ablate,
    )

    def from_tiles(x, rows, f):
        return x.transpose(0, 2, 1, 3).reshape(b, rows, f)

    return from_tiles(xc_o, m, h), from_tiles(xq_o, n, h)


def prep_operators(operators: tuple, weights: RoundWeights, mh: int, cdt,
                   fold: bool = False, biasfold: bool = False):
    """Kernel-layout constants from make_operators output.

    Operators are reordered slot-major ([D, rows, src]: row index in
    make_operators' layout is rows*D + k) so kernels can consume one slot
    GEMM at a time; gather operators travel in the compute dtype (entries
    are 0/1 — exact); the per-row pad-slot count (D - deg) and the degree x
    out-bias product are pre-expanded over the lane dim into f32
    [rows, 1, F] operands (single-axis broadcasts only — Mosaic bf16
    lowering constraints).  Returns
    (g_c, defc_c, degbo_c, g_q, defc_q, degbo_q).
    """
    g_c, mask_c, deg_c, g_q, mask_q, deg_q = operators
    f32 = jnp.float32
    m = deg_c.shape[0]
    n = deg_q.shape[0]
    dc = g_c.shape[0] // m
    dq = g_q.shape[0] // n
    g_c = g_c.reshape(m, dc, -1).transpose(1, 0, 2).astype(cdt)
    g_q = g_q.reshape(n, dq, -1).transpose(1, 0, 2).astype(cdt)
    defc_c = jnp.broadcast_to((dc - deg_c).reshape(-1, 1, 1), (m, 1, mh)).astype(f32)
    defc_q = jnp.broadcast_to((dq - deg_q).reshape(-1, 1, 1), (n, 1, mh)).astype(f32)
    degbo_c = (deg_c.reshape(-1, 1, 1) * weights.bo_c[0]).astype(f32)
    degbo_q = (deg_q.reshape(-1, 1, 1) * weights.bo_q[0]).astype(f32)
    if fold:
        # the kernel's fold variant skips the @ua GEMM, so the constant
        # aggregation bias must carry it: (deg * bo) @ ua, f32 outside
        degbo_c = degbo_c @ weights.uc_a.astype(f32)
        degbo_q = degbo_q @ weights.uq_a.astype(f32)
    if biasfold:
        if not fold:
            raise ValueError("biasfold requires fold")
        # the update-MLP input biases are round-invariant: carry them in
        # the aggregation constants so the kernel drops two broadcast adds
        degbo_c = degbo_c + weights.uc_b0.astype(f32)
        degbo_q = degbo_q + weights.uq_b0.astype(f32)
    return g_c, defc_c, degbo_c, g_q, defc_q, degbo_q


def pack_weights(w: RoundWeights, cdt, fold: bool = False):
    """Pack the ~30 weight leaves into 5 kernel operands.

    Fewer per-grid-step DMAs; GEMM weights pre-cast to the compute dtype,
    biases/LN parameters in f32.  The projection packs fuse each node
    type's three input GEMMs (both message directions + the update MLP's
    state term) into one wide MXU contraction per round:

        wproj_c [H, 2MH+H] = [wd_c | ws_q | uc_x]   (multiplies x_check)
        wproj_q [H, 2MH+H] = [ws_c | wd_q | uq_x]   (multiplies x_qubit)
        w2 [2MH+4H, H]     = [wo_c | wo_q | uc_a | uq_a | uc_w1 | uq_w1]
        bmh [2, MH]        = [b0_c ; b0_q]          (f32)
        bh [8, H]          = [uc_b0; uc_b1; uq_b0; uq_b1;
                              lnc_scale; lnc_bias; lnq_scale; lnq_bias]
    """
    f32 = jnp.float32
    wproj_c = jnp.concatenate([w.wd_c, w.ws_q, w.uc_x], axis=1).astype(cdt)
    wproj_q = jnp.concatenate([w.ws_c, w.wd_q, w.uq_x], axis=1).astype(cdt)
    wo_c, wo_q = w.wo_c, w.wo_q
    if fold:
        # aggregation only feeds the update MLP: fold wo@ua into one weight
        # (f32 product, then one cast — the ua slots below become unused)
        wo_c = wo_c.astype(f32) @ w.uc_a.astype(f32)
        wo_q = wo_q.astype(f32) @ w.uq_a.astype(f32)
    w2 = jnp.concatenate(
        [wo_c, wo_q, w.uc_a, w.uq_a, w.uc_w1, w.uq_w1], axis=0
    ).astype(cdt)
    bmh = jnp.concatenate([w.b0_c, w.b0_q], axis=0).astype(f32)
    bh = jnp.concatenate(
        [w.uc_b0, w.uc_b1, w.uq_b0, w.uq_b1,
         w.lnc_scale, w.lnc_bias, w.lnq_scale, w.lnq_bias], axis=0
    ).astype(f32)
    return wproj_c, wproj_q, w2, bmh, bh


@functools.partial(
    jax.jit, static_argnames=("rounds", "interpret", "compute_dtype", "ablate")
)
def decoder_rounds_tiled(
    xc_t: jnp.ndarray,     # [nblk, M, TB, H] compute dtype
    xq_t: jnp.ndarray,     # [nblk, N, TB, H]
    syn_ucs: jnp.ndarray,  # [nblk, M, TB, H] (syndrome feature * uc_s)
    operators: tuple,      # from make_operators(graph)
    weights: RoundWeights,
    *,
    rounds: int,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
    ablate: tuple | None = None,
):
    """Tiled-layout core: inputs/outputs already in [nblk, rows, TB, F].

    Callers that can produce embeddings directly in the tiled layout (the
    PallasDecoder does) skip the four large state transposes that the
    [B, rows, F] wrapper pays.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nblk, m, tb, h = xc_t.shape
    n = xq_t.shape[1]
    b = nblk * tb
    g_c, mask_c, deg_c, g_q, mask_q, deg_q = operators
    dc = g_c.shape[0] // m
    dq = g_q.shape[0] // n
    mh = weights.wd_c.shape[1]
    if mh % 128:
        # narrow models: pad the message width to the lane dim so the
        # kernel's lane-merging shape casts lower (see pad_msg_width)
        weights = pad_msg_width(weights, -(-mh // 128) * 128)
        mh = weights.wd_c.shape[1]
    cdt = jnp.dtype(compute_dtype)

    if ablate is None:
        ablate = PROD_VARIANTS
    fold = "fold" in ablate
    ops = prep_operators(operators, weights, mh, cdt, fold=fold,
                         biasfold="biasfold" in ablate)
    packs = pack_weights(weights, cdt, fold=fold)

    kernel = _make_kernel(m, n, dc, dq, h, mh, rounds, tb, cdt,
                          ablate=frozenset(ablate))

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    tile_spec = lambda rows, f: pl.BlockSpec(
        (1, rows, tb, f), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    flops_round = 2 * (
        m * h * mh + n * h * mh + m * dc * n * mh + n * h * mh + m * h * mh
        + n * dq * m * mh + m * mh * h + n * mh * h + 4 * m * h * h + 4 * n * h * h
    )
    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            # Mosaic's default scoped-VMEM limit is a conservative 16 MB;
            # v5e cores have headroom above that, and the TB=16 tile needs
            # ~24 MB of kernel-internal live values (measured from the
            # compiler's own OOM report).  Gated by pick_block_batch: small
            # tiles never come near either limit.
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblk, m, tb, h), cdt),
            jax.ShapeDtypeStruct((nblk, n, tb, h), cdt),
        ),
        grid_spec=pl.GridSpec(
            grid=(nblk,),
            in_specs=[
                tile_spec(m, h),
                tile_spec(n, h),
                tile_spec(m, h),   # syn_ucs
                *[full(o) for o in ops],
                *[full(x) for x in packs],
            ],
            out_specs=(tile_spec(m, h), tile_spec(n, h)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * rounds * flops_round,
            bytes_accessed=4 * b * (2 * (m + n) * h + m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xc_t, xq_t, syn_ucs, *ops, *packs)
    return tuple(x.astype(jnp.float32) for x in out)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, rematerialized XLA backward
# ---------------------------------------------------------------------------

def rounds_xla(xc, xq, syn, operators, weights: RoundWeights, *, rounds: int):
    """Pure-XLA twin of the kernel's round loop (f32, batch layout).

    Shares RoundWeights/operators with the kernel and mirrors its math
    exactly (chunk order differences only reassociate f32 sums).  Used as
    the rematerialized backward for :func:`make_differentiable_rounds` and
    as a CPU-friendly reference in tests.
    """
    g_c, mask_c, deg_c, g_q, mask_q, deg_q = operators
    w = weights
    m = xc.shape[1]
    n = xq.shape[1]
    dc = g_c.shape[0] // m
    dq = g_q.shape[0] // n
    mh = w.wd_c.shape[1]

    def direction(x_dst, x_src, g, mask, deg, wd, ws, b0, wo, bo, rows, d):
        yd = x_dst @ wd                                    # [B, rows, MH]
        ys = x_src @ ws
        zs = jnp.einsum("es,bsf->bef", g, ys,
                        preferred_element_type=jnp.float32)
        zd = jnp.broadcast_to(
            yd[:, :, None, :], yd.shape[:2] + (d, mh)
        ).reshape(yd.shape[0], rows * d, mh)
        z = jax.nn.relu(zs + zd + b0) * mask[None, :, :]
        hs = jnp.sum(z.reshape(z.shape[0], rows, d, mh), axis=2)
        return hs @ wo + deg[None] * bo

    def body(carry, _):
        xc, xq = carry
        agg_c = direction(xc, xq, g_c, mask_c, deg_c,
                          w.wd_c, w.ws_c, w.b0_c, w.wo_c, w.bo_c, m, dc)
        agg_q = direction(xq, xc, g_q, mask_q, deg_q,
                          w.wd_q, w.ws_q, w.b0_q, w.wo_q, w.bo_q, n, dq)
        hc = jax.nn.relu(xc @ w.uc_x + agg_c @ w.uc_a + syn * w.uc_s + w.uc_b0)
        xc2 = _ln(xc + hc @ w.uc_w1 + w.uc_b1, w.lnc_scale, w.lnc_bias)
        hq = jax.nn.relu(xq @ w.uq_x + agg_q @ w.uq_a + w.uq_b0)
        xq2 = _ln(xq + hq @ w.uq_w1 + w.uq_b1, w.lnq_scale, w.lnq_bias)
        return (xc2, xq2), None

    (xc, xq), _ = jax.lax.scan(body, (xc, xq), None, length=rounds)
    return xc, xq


def make_differentiable_rounds(
    operators: tuple, *, rounds: int, compute_dtype: str = "bfloat16",
    interpret: bool | None = None, use_kernel: bool = True,
):
    """(xc, xq, syn, weights) -> (xc_out, xq_out), differentiable.

    Forward runs the fused Pallas kernel; backward rematerializes through
    :func:`rounds_xla` with jax.vjp (standard mixed-precision practice: the
    f32 XLA twin defines the gradients of the bf16 kernel forward).
    """

    def _fwd_impl(xc, xq, syn, weights):
        if use_kernel:
            return decoder_rounds(
                xc, xq, syn, operators, weights,
                rounds=rounds, interpret=interpret,
                compute_dtype=compute_dtype,
            )
        return rounds_xla(xc, xq, syn, operators, weights, rounds=rounds)

    @jax.custom_vjp
    def f(xc, xq, syn, weights):
        return _fwd_impl(xc, xq, syn, weights)

    def fwd(xc, xq, syn, weights):
        return _fwd_impl(xc, xq, syn, weights), (xc, xq, syn, weights)

    def bwd(res, cot):
        xc, xq, syn, weights = res
        _, vjp = jax.vjp(
            lambda a, b, c, w: rounds_xla(a, b, c, operators, w, rounds=rounds),
            xc, xq, syn, weights,
        )
        return vjp(cot)

    f.defvjp(fwd, bwd)
    return f
