"""Roll-gather decoder kernel: slot gathers as cyclic shifts, not GEMMs.

The idle-host ablation (runs/probe_ablate_r3.json) showed the 8 one-hot
slot-gather GEMMs are the dominant cost of the fused decoder above the
floor (~16.5 ms of a 38 ms step; dropping 6 of them saves 12.4 ms) — and
their cost is FLOP-floor, not scheduling: a one-hot matmul spends
M x N x TB x MH MACs to move M x TB x MH values.

This module removes the GEMMs entirely for the rotated surface code by
exploiting its lattice structure.  On a **(d+1)-pitch raster ordering** —
check (plaquette) (i, j) at cell i*(d+1)+j, data qubit (r, c) at cell
r*(d+1)+c, both living in a common length-L=(d+1)^2 index space — every
slot's source offset is a GLOBAL constant (verified for all d in
tests/kernels/test_roll_gather.py):

    check side  (qubit sources):  {-(d+2), -(d+1), -1, 0}
    qubit side  (check sources):  {0, 1, d+1, d+2}

so each slot gather is one cyclic rotation of the source panel (two static
slices + concat on the major axis — pure data movement, no MXU) followed by
the same relu + per-slot mask accumulate the original masked kernel used
(masks are exact here: boundary/missing neighbors simply mask to zero, and
rotation wrap-around rows are always masked).  Node GEMMs grow with the
raster row count (L_pad vs the original m_pad/n_pad, ~+13% at d=11) —
a ~1 ms trade for ~16 ms of gather GEMMs.

The raster permutation lives entirely inside this path: callers pass
original-layout states; the wrapper permutes rows in (one XLA take per
step), runs all R rounds on the raster, and permutes back.  Weights are
node-independent (weight-tied message passing), so existing checkpoints
work unchanged.

Inference-only for now: training keeps the gather-GEMM VJP path.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugnn.kernels import fused_decoder as fd
from tpugnn.kernels.fused_decoder import RoundWeights, pack_weights

__all__ = ["RollPlan", "raster_plan", "decoder_rounds_roll"]

f32 = jnp.float32


class RollPlan(NamedTuple):
    """Raster layout + roll schedule for one surface-code graph."""

    d: int
    l_pad: int                 # raster length, padded to a multiple of 8
    offs_c: tuple              # per-slot source offsets, check side (qubits)
    offs_q: tuple              # per-slot source offsets, qubit side (checks)
    cell_of_check: np.ndarray  # i32[m_pad] raster cell of each original row
    cell_of_qubit: np.ndarray  # i32[n_pad]
    mask_c: np.ndarray         # f32[Dc, L, 1] slot-valid masks (check side)
    mask_q: np.ndarray         # f32[Dq, L, 1]
    deg_c: np.ndarray          # f32[L, 1] raster check degrees
    deg_q: np.ndarray          # f32[L, 1]


def raster_plan(graph) -> RollPlan | None:
    """Derive the raster permutation + roll schedule, or None if the graph
    is not an open-boundary rotated surface code (structure-checked, not
    name-checked: every edge must land on one of the four constant
    offsets)."""
    n, m = graph.n_qubits, graph.n_checks
    d = math.isqrt(n)
    if d * d != n or m != n - 1:
        return None
    ec = np.asarray(graph.edge_check)[: graph.n_edges]
    eq = np.asarray(graph.edge_qubit)[: graph.n_edges]
    cell_q = np.array([(q // d) * (d + 1) + (q % d) for q in range(n)],
                      np.int32)
    # plaquette (i, j) of each check from its qubit support: rows present
    # are {i-1, i} clipped to the grid; a single row r0 means i = 0 (r0 = 0)
    # or i = d (r0 = d-1); same for columns
    sup_r: list[list[int]] = [[] for _ in range(m)]
    sup_c: list[list[int]] = [[] for _ in range(m)]
    for e in range(len(ec)):
        c, q = int(ec[e]), int(eq[e])
        if c >= m or q >= n:
            return None
        sup_r[c].append(q // d)
        sup_c[c].append(q % d)

    def corner(vals: list[int]) -> int | None:
        lo, hi = min(vals), max(vals)
        if hi == lo + 1:
            return hi
        if hi == lo:
            return 0 if lo == 0 else (d if lo == d - 1 else None)
        return None

    cell_c = np.zeros(m, np.int32)
    for c in range(m):
        if not sup_r[c]:
            return None
        i = corner(sup_r[c])
        j = corner(sup_c[c])
        if i is None or j is None:
            return None
        cell_c[c] = i * (d + 1) + j
    if len(set(cell_c.tolist())) != m:
        return None

    l = (d + 1) * (d + 1)
    l_pad = -(-l // 8) * 8
    offs_c = (0, -1, -(d + 1), -(d + 2))
    offs_q = (0, 1, d + 1, d + 2)
    # slot masks from the actual edge set (exact: wrap-around and missing
    # neighbors never appear as edges)
    edges = {(int(cell_c[c]), int(cell_q[q])) for c, q in zip(ec, eq)}
    mask_c = np.zeros((len(offs_c), l_pad, 1), np.float32)
    mask_q = np.zeros((len(offs_q), l_pad, 1), np.float32)
    for k, o in enumerate(offs_c):
        for c in range(m):
            cc = int(cell_c[c])
            if (cc, cc + o) in edges:
                mask_c[k, cc, 0] = 1.0
    for k, o in enumerate(offs_q):
        for q in range(n):
            qq = int(cell_q[q])
            # edges are (check_cell, qubit_cell); the qubit side's source
            # at offset o is the CHECK at cell qq + o
            if (qq + o, qq) in edges:
                mask_q[k, qq, 0] = 1.0
    # every edge must be covered exactly once across slots
    if mask_c.sum() != len(edges) or mask_q.sum() != len(edges):
        return None
    # raster cell -> original padded row (empty cells point at the last
    # padded row, whose state is zero on entry and masked downstream)
    m_pad, n_pad = graph.n_checks_pad, graph.n_qubits_pad
    cell_of_check = np.full(m_pad, l_pad - 1, np.int32)
    cell_of_check[:m] = cell_c
    cell_of_qubit = np.full(n_pad, l_pad - 1, np.int32)
    cell_of_qubit[:n] = cell_q
    deg_c = mask_c.sum(axis=0)
    deg_q = mask_q.sum(axis=0)
    return RollPlan(d, l_pad, offs_c, offs_q, cell_of_check, cell_of_qubit,
                    mask_c, mask_q, deg_c, deg_q)


@functools.lru_cache(maxsize=16)
def plan_from_name(name: str, pad_nodes: int = 8, pad_edges: int = 8):
    """Host-side plan for a named code, cached — usable under jit.

    ``PallasDecoder.apply`` runs inside the caller's jit, where the graph's
    arrays are tracers; the plan is pure graph structure, so rebuild the
    code host-side from its static name (e.g. 'surface_d11') instead.
    Returns None for non-surface names or non-default padding.
    """
    if not name.startswith("surface_d"):
        return None
    try:
        d = int(name.split("surface_d", 1)[1])
    except ValueError:
        return None
    from tpugnn.tanner import build_code

    # plan_from_name is typically called INSIDE a caller's jit trace (the
    # graph argument there is a tracer pytree); escape the trace so the
    # rebuilt graph is concrete
    with jax.ensure_compile_time_eval():
        g = build_code("surface", d, pad_nodes=pad_nodes,
                       pad_edges=pad_edges)
        plan = raster_plan(g)
    return g, plan


def _rot(x, o: int):
    """zk[i] = x[(i + o) mod L] via two static slices (Mosaic-friendly)."""
    o = o % x.shape[0]
    if o == 0:
        return x
    return jnp.concatenate([x[o:], x[:o]], axis=0)


def _make_roll_kernel(L, H, MH, R, TB, cdt, offs_c, offs_q, nc_slots,
                      nq_slots, slot_f32: bool = True):
    """Round kernel on the raster layout; slot gathers are rotations.

    ``slot_f32=False`` keeps the whole slot stage (rotation, relu, mask,
    4-term accumulation) in the compute dtype — the roll form is
    VPU-bound, so halving its bytes is the lever the GEMM form cannot
    reach (Mosaic forces 32-bit matmul accumulators).  bf16 4-term sums
    of O(1) activations cost ~2-3 decimal digits; decode parity is
    asserted at bf16 tolerance in tests."""

    def dot2(a, b):
        r = jnp.dot(a.reshape(-1, a.shape[-1]), b,
                    preferred_element_type=f32)
        return r.reshape(a.shape[0], a.shape[1], b.shape[-1])

    def kernel(xc_ref, xq_ref, syn_ucs_ref,
               mask_c_ref, mask_q_ref, degbo_c_ref, degbo_q_ref,
               wproj_c_ref, wproj_q_ref, w2_ref, bmh_ref, bh_ref,
               out_xc_ref, out_xq_ref):
        wproj_c = wproj_c_ref[:]
        wproj_q = wproj_q_ref[:]
        w2 = w2_ref[:]
        bmh = bmh_ref[:]
        bh = bh_ref[:]
        # fold layout (pack_weights(fold=True)): w2 = [wo_c@ua | wo_q@ua |
        # uc_a (unused) | uq_a (unused) | uc_w1 | uq_w1]
        wo_c, wo_q = w2[0:MH], w2[MH:2 * MH]
        uc_w1 = w2[2 * MH + 2 * H:2 * MH + 3 * H]
        uq_w1 = w2[2 * MH + 3 * H:2 * MH + 4 * H]
        b0_c, b0_q = bmh[0:1], bmh[1:2]
        uc_b0, uc_b1, uq_b0, uq_b1 = bh[0:1], bh[1:2], bh[2:3], bh[3:4]
        lnc_s, lnc_b, lnq_s, lnq_b = bh[4:5], bh[5:6], bh[6:7], bh[7:8]

        xc0 = xc_ref[0]                    # cdt [L, TB, H]
        xq0 = xq_ref[0]
        syn_ucs = syn_ucs_ref[0].astype(f32)
        mask_c = mask_c_ref[:]             # f32 [Dc, L, 1]
        mask_q = mask_q_ref[:]
        degbo_c = degbo_c_ref[:]           # f32 [L, 1, H] (folded deg*bo@ua)
        degbo_q = degbo_q_ref[:]

        sdt = f32 if slot_f32 else cdt

        def slot_sum_roll(ys, ydb, masks, offs, nslots):
            # masks arrive pre-expanded [Dk, L, 1, MH] (single-axis TB
            # broadcast only — Mosaic rejects sublane+lane double
            # broadcasts in some dtypes)
            ydb = ydb.astype(sdt)
            hs = None
            for k in range(nslots):
                zk = _rot(ys, offs[k]).astype(sdt)
                t = jax.nn.relu(zk + ydb) * masks[k]
                hs = t if hs is None else hs + t
            return hs

        def round_body(_, carry):
            xc, xq = carry
            yc = dot2(xc, wproj_c)                     # f32 [L, TB, 2MH+H]
            yq = dot2(xq, wproj_q)
            ydb_c = yc[..., :MH] + b0_c
            ys_c = yq[..., :MH].astype(cdt)            # qubit sources
            ydb_q = yq[..., MH:2 * MH] + b0_q
            ys_q = yc[..., MH:2 * MH].astype(cdt)      # check sources
            xc_ux = yc[..., 2 * MH:]
            xq_ux = yq[..., 2 * MH:]

            hs_c = slot_sum_roll(ys_c, ydb_c, mask_c, offs_c,
                                 nc_slots).astype(cdt)
            hs_q = slot_sum_roll(ys_q, ydb_q, mask_q, offs_q,
                                 nq_slots).astype(cdt)
            # fold: wo carries @ua, degbo carries (deg*bo)@ua
            agg_c = dot2(hs_c, wo_c) + degbo_c
            agg_q = dot2(hs_q, wo_q) + degbo_q

            pre_c = xc_ux + agg_c + syn_ucs + uc_b0
            pre_q = xq_ux + agg_q + uq_b0
            hc = jax.nn.relu(pre_c).astype(cdt)
            xc_new = fd._ln(
                xc.astype(f32) + dot2(hc, uc_w1) + uc_b1, lnc_s, lnc_b
            ).astype(cdt)
            hq = jax.nn.relu(pre_q).astype(cdt)
            xq_new = fd._ln(
                xq.astype(f32) + dot2(hq, uq_w1) + uq_b1, lnq_s, lnq_b
            ).astype(cdt)
            return xc_new, xq_new

        xc, xq = jax.lax.fori_loop(0, R, round_body, (xc0, xq0))
        out_xc_ref[0] = xc
        out_xq_ref[0] = xq

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("static_plan", "rounds", "interpret", "block_batch",
                     "compute_dtype", "slot_dtype"),
)
def decoder_rounds_roll(
    xc0: jnp.ndarray,      # [B, m_pad, H] original layout, f32
    xq0: jnp.ndarray,      # [B, n_pad, H]
    syn: jnp.ndarray,      # [B, m_pad, 1]
    plan_arrays: tuple,    # device arrays from plan (see wrapper below)
    static_plan: tuple,    # (d, l_pad, offs_c, offs_q) hashable statics
    weights: RoundWeights,
    *,
    rounds: int,
    interpret: bool | None = None,
    block_batch: int = 32,
    compute_dtype: str = "bfloat16",
    slot_dtype: str = "float32",
):
    """Run R rounds on the raster layout; returns (xc, xq) in the ORIGINAL
    row layout (f32).  ``plan_arrays`` = (cell_of_check, cell_of_qubit,
    mask_c, mask_q, degbo_c, degbo_q) as jnp arrays."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d, l_pad, offs_c, offs_q = static_plan
    (cell_c, cell_q, mask_c, mask_q, deg_c, deg_q) = plan_arrays
    b, m_pad, h = xc0.shape
    mh = weights.wd_c.shape[1]
    if mh % 128:
        weights = fd.pad_msg_width(weights, -(-mh // 128) * 128)
        mh = weights.wd_c.shape[1]
    cdt = jnp.dtype(compute_dtype)
    tb = fd.pick_block_batch(l_pad * 2, mh, cdt.itemsize, b, block_batch)
    nblk = b // tb

    # scatter original rows into raster cells: build inverse gather — for
    # each raster cell, the original row living there (or a padded row)
    inv_c = jnp.zeros((l_pad,), jnp.int32).at[cell_c].set(
        jnp.arange(m_pad, dtype=jnp.int32))
    # cells not owned by any real row must read a zero source row: padded
    # original rows are zero-state, and cell_of_check maps ALL pad rows to
    # cell l_pad-1, so cells never touched keep index 0's row — mask them:
    owned_c = jnp.zeros((l_pad,), bool).at[cell_c].set(True)
    n_pad = xq0.shape[1]
    inv_q = jnp.zeros((l_pad,), jnp.int32).at[cell_q].set(
        jnp.arange(n_pad, dtype=jnp.int32))
    owned_q = jnp.zeros((l_pad,), bool).at[cell_q].set(True)

    def to_tiles_from_orig(x, inv, owned, rows):
        xr = jnp.take(x, inv, axis=1) * owned[None, :, None]
        return (xr.reshape(nblk, tb, rows, x.shape[-1])
                .transpose(0, 2, 1, 3).astype(cdt))

    xc_t = to_tiles_from_orig(xc0, inv_c, owned_c, l_pad)
    xq_t = to_tiles_from_orig(xq0, inv_q, owned_q, l_pad)
    syn_r = jnp.take(syn * weights.uc_s[0], inv_c, axis=1) \
        * owned_c[None, :, None]
    syn_t = (syn_r.reshape(nblk, tb, l_pad, h)
             .transpose(0, 2, 1, 3).astype(cdt))

    # folded constants (fold schedule): degbo = (deg * bo) @ ua
    degbo_c = (deg_c.reshape(-1, 1, 1) * weights.bo_c[0]).astype(f32) \
        @ weights.uc_a.astype(f32)
    degbo_q = (deg_q.reshape(-1, 1, 1) * weights.bo_q[0]).astype(f32) \
        @ weights.uq_a.astype(f32)
    packs = pack_weights(weights, cdt, fold=True)

    slot_f32 = slot_dtype == "float32"
    kernel = _make_roll_kernel(l_pad, h, mh, rounds, tb, cdt,
                               offs_c, offs_q,
                               mask_c.shape[0], mask_q.shape[0],
                               slot_f32=slot_f32)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    tile_spec = lambda rows, f: pl.BlockSpec(
        (1, rows, tb, f), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    # masks pre-expanded over the lane dim: [Dk, L, 1] -> [Dk, L, 1, MH],
    # pre-cast to the slot dtype (no per-slot cast passes in-kernel)
    sdt = f32 if slot_f32 else cdt
    expand = lambda mk: jnp.broadcast_to(
        mk.astype(sdt)[:, :, :, None], mk.shape[:2] + (1, mh))
    consts = (expand(mask_c), expand(mask_q), degbo_c, degbo_q)
    xc_o, xq_o = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fd._VMEM_LIMIT),
        out_shape=(
            jax.ShapeDtypeStruct((nblk, l_pad, tb, h), cdt),
            jax.ShapeDtypeStruct((nblk, l_pad, tb, h), cdt),
        ),
        grid_spec=pl.GridSpec(
            grid=(nblk,),
            in_specs=[tile_spec(l_pad, h), tile_spec(l_pad, h),
                      tile_spec(l_pad, h),
                      *[full(o) for o in consts], *[full(x) for x in packs]],
            out_specs=(tile_spec(l_pad, h), tile_spec(l_pad, h)),
        ),
        interpret=interpret,
    )(xc_t, xq_t, syn_t, *consts, *packs)

    def back(x_o, cells, rows_out):
        xb = x_o.transpose(0, 2, 1, 3).reshape(b, l_pad, h)
        return jnp.take(xb, cells, axis=1).astype(f32)

    return back(xc_o, cell_c, m_pad), back(xq_o, cell_q, n_pad)
