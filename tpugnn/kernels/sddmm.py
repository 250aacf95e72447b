"""Pallas SDDMM: per-edge message pre-activations, gather fused into the GEMM.

The reference's collect+message stage (SURVEY.md §2.2 N3) gathers both
endpoint features per edge and runs the first edge-MLP layer over the
concat.  On TPU the gather IS a matmul: with the split-concat identity
(models/fused_cell.py) the per-slot pre-activation is

    z[e] = relu( (x_src @ Ws)[src(e)]  +  (x_dst @ Wd)[dst(e)]  +  b )

where the slot gather ``[src(e)]`` is a one-hot incidence matmul on the MXU
and the dst "gather" is a broadcast (ELL slots are grouped by destination
row).  This kernel computes ``z`` for one direction, fused in VMEM — it is
the standalone version of the first half of the fused decoder round
(kernels/fused_decoder.py), exposed for custom message-passing layers that
want TPU-speed edge features without adopting the whole fused decoder.

Layout: grid over batch tiles, activations [rows, TB, F] (see
fused_decoder._make_kernel for the rationale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugnn.kernels.fused_decoder import pick_block_batch

__all__ = ["sddmm_edge_hidden"]


def _make_kernel(rows_dst, rows_src, d, tb, mh, cdt):
    def kernel(xd_ref, xs_ref, g_ref, mask_ref, wd_ref, ws_ref, b_ref, out_ref):
        xd = xd_ref[0].astype(cdt)      # [rows_dst, TB, H]
        xs = xs_ref[0].astype(cdt)      # [rows_src, TB, H]
        g = g_ref[:].astype(cdt)        # [rows_dst*D, rows_src]
        mask = mask_ref[:].astype(cdt)  # [rows_dst*D, 1, MH] (lane-expanded)
        wd = wd_ref[:].astype(cdt)      # [H, MH]
        ws = ws_ref[:].astype(cdt)
        b = b_ref[:].astype(cdt)        # [1, MH]

        yd = jnp.dot(
            xd.reshape(-1, xd.shape[-1]), wd, preferred_element_type=jnp.float32
        ).reshape(rows_dst, tb, mh).astype(cdt)
        ys = jnp.dot(
            xs.reshape(-1, xs.shape[-1]), ws, preferred_element_type=jnp.float32
        ).reshape(rows_src, tb, mh).astype(cdt)
        zs = jnp.dot(
            g, ys.reshape(rows_src, -1), preferred_element_type=jnp.float32
        ).reshape(rows_dst * d, tb, mh).astype(cdt)
        zd = jnp.broadcast_to(
            yd[:, None, :, :], (rows_dst, d, tb, mh)
        ).reshape(rows_dst * d, tb, mh)
        out_ref[0] = (jax.nn.relu(zs + zd + b) * mask).astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def sddmm_edge_hidden(
    x_dst: jnp.ndarray,      # [B, rows_dst, H]
    x_src: jnp.ndarray,      # [B, rows_src, H]
    g_src: jnp.ndarray,      # f32[rows_dst*D, rows_src] one-hot src gather
    slot_mask: jnp.ndarray,  # f32[rows_dst, D]
    wd: jnp.ndarray,         # [H, MH]
    ws: jnp.ndarray,
    b: jnp.ndarray,          # [MH]
    *,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
):
    """relu(one-hot-gather(x_src @ ws) + broadcast(x_dst @ wd) + b), masked.

    Returns f32[B, rows_dst * D, MH] in ELL slot order.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, rows_dst, h = x_dst.shape
    rows_src = x_src.shape[1]
    d = g_src.shape[0] // rows_dst
    mh = wd.shape[1]
    cdt = jnp.dtype(compute_dtype)
    tb = pick_block_batch(g_src.shape[0], mh, cdt.itemsize, bsz)
    nblk = bsz // tb

    def to_tiles(x, rows):
        return x.reshape(nblk, tb, rows, h).transpose(0, 2, 1, 3).astype(cdt)

    mask_l = jnp.broadcast_to(
        slot_mask.reshape(-1, 1, 1), (g_src.shape[0], 1, mh)
    ).astype(jnp.float32)
    b2 = b.reshape(1, -1).astype(jnp.float32)

    kernel = _make_kernel(rows_dst, rows_src, d, tb, mh, cdt)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblk, rows_dst * d, tb, mh), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, rows_dst, tb, h), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_src, tb, h), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                full(g_src), full(mask_l), full(wd), full(ws), full(b2),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_dst * d, tb, mh), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(to_tiles(x_dst, rows_dst), to_tiles(x_src, rows_src),
      g_src.astype(jnp.float32), mask_l, wd.astype(jnp.float32),
      ws.astype(jnp.float32), b2)
    return out.transpose(0, 2, 1, 3).reshape(bsz, rows_dst * d, mh)
