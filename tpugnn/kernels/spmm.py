"""Pallas SpMM: ELL slot-table aggregation as an on-chip incidence matmul.

Replaces the reference's torch_scatter ``scatter_add`` (SURVEY.md §2.2 N1)
with a deterministic reduction expressed as a matmul on the MXU:

    out[b, r, f] = sum_k msg[b, slot_edge[r, k], f] * slot_mask[r, k]
                 = (S @ msg[b])[r, f],   S[r, e] = #{k : slot_edge[r,k] = e,
                                                      mask[r,k] = 1}

``S`` is the (row x edge) incidence operator; QEC Tanner graphs are tiny
(d=11 surface: 128 x 512 padded) while the batch is large, so the kernel
grids over (batch tiles x feature tiles), keeps ``S`` resident in VMEM, and
issues one [rows, E] x [E, TF] MXU contraction per (batch element, tile) —
zero scatter traffic, bit-deterministic.

The incidence matrix is built once per (graph, trace) from the slot tables
by XLA (one-hot + segment into rows) and is a compile-time-shaped dense
operand; for graphs too large for VMEM the mp layer falls back to the
``ell`` XLA path automatically (see tpugnn.mp.aggregate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ell_aggregate", "slot_incidence", "slot_gather_operator"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def slot_incidence(slot_edge: jnp.ndarray, slot_mask: jnp.ndarray, n_edges_pad: int) -> jnp.ndarray:
    """Dense f32[rows, E_pad] incidence operator from ELL slot tables."""
    rows, d = slot_edge.shape
    oh = jax.nn.one_hot(slot_edge, n_edges_pad, dtype=jnp.float32)  # [rows, D, E]
    return jnp.sum(oh * slot_mask[..., None], axis=1)


def slot_gather_operator(
    slot_edge: jnp.ndarray, slot_mask: jnp.ndarray, n_edges_pad: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense f32[rows*D, E_pad] slot-gather operator + f32[rows*D, 1] mask.

    Unlike :func:`slot_incidence` (which sums slots into rows), each output
    row picks exactly one edge, so ``G @ msg`` is an exact gather into the
    [rows, D] slot layout — the MXU expression of the reference's
    ``index_select`` collect step [SURVEY.md §2.2 N3] that order-sensitive
    reductions (max) need.
    """
    rows, d = slot_edge.shape
    g = jax.nn.one_hot(slot_edge.reshape(-1), n_edges_pad, dtype=jnp.float32)
    return g, slot_mask.reshape(-1, 1).astype(jnp.float32)


def _spmm_kernel(s_ref, msg_ref, out_ref):
    # s_ref: [rows, E]; msg_ref: [TB, E, TF]; out_ref: [TB, rows, TF]
    tb = msg_ref.shape[0]
    for b in range(tb):  # static unroll over the batch tile
        out_ref[b, :, :] = jnp.dot(
            s_ref[:, :], msg_ref[b, :, :], preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_aggregate_impl(msg, s, *, interpret=False):
    b, e_pad, f = msg.shape
    rows = s.shape[0]
    tb = 8 if b % 8 == 0 else 1
    tf = min(f, 128)
    if f % tf:
        raise ValueError(f"feature dim {f} must be a multiple of {tf}")
    grid = (b // tb, f // tf)
    return pl.pallas_call(
        _spmm_kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, f), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows, e_pad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, e_pad, tf), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, rows, tf), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * rows * e_pad * f,
            bytes_accessed=4 * (b * e_pad * f + b * rows * f + rows * e_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(s, msg)


def _spmax_kernel(d, g_ref, mask_ref, msg_ref, out_ref):
    # g_ref: [rows*D, E]; mask_ref: [rows*D, 1]; msg_ref: [TB, E, TF];
    # out_ref: [TB, rows, TF].  Gather into slot layout via one MXU GEMM,
    # then masked max over the D slots (padded slots -> -inf -> 0).
    tb = msg_ref.shape[0]
    neg = jnp.float32(-jnp.inf)
    for b in range(tb):  # static unroll over the batch tile
        zs = jnp.dot(
            g_ref[:, :], msg_ref[b, :, :], preferred_element_type=jnp.float32
        )                                                  # [rows*D, TF]
        zs = jnp.where(mask_ref[:, :] > 0, zs, neg)
        zs4 = zs.reshape(zs.shape[0] // d, d, zs.shape[1])  # major-dim split
        mx = zs4[:, 0]
        for k in range(1, d):
            mx = jnp.maximum(mx, zs4[:, k])
        out_ref[b, :, :] = jnp.where(jnp.isneginf(mx), 0.0, mx)


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def _ell_max_impl(msg, g, mask, *, d, interpret=False):
    b, e_pad, f = msg.shape
    rows = g.shape[0] // d
    tb = 8 if b % 8 == 0 else 1
    tf = min(f, 128)
    if f % tf:
        raise ValueError(f"feature dim {f} must be a multiple of {tf}")
    grid = (b // tb, f // tf)
    return pl.pallas_call(
        functools.partial(_spmax_kernel, d),
        out_shape=jax.ShapeDtypeStruct((b, rows, f), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows * d, e_pad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows * d, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, e_pad, tf), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, rows, tf), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * rows * d * e_pad * f,
            bytes_accessed=4 * (b * e_pad * f + b * rows * f + rows * d * e_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, mask, msg)


def ell_aggregate(
    msg: jnp.ndarray,
    slot_edge: jnp.ndarray,
    slot_mask: jnp.ndarray,
    *,
    agg: str = "sum",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Aggregate per-edge messages into destination rows via the ELL tables.

    msg: [..., E_pad, F] (canonical edge order) -> [..., rows, F].
    sum/mean use the incidence-matmul kernel (mean is scaled by the caller);
    max uses the slot-gather GEMM + masked slot-max kernel.
    """
    if agg not in ("sum", "mean", "max"):
        raise ValueError(f"unknown aggregation {agg!r}; have sum|mean|max")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # CPU tests interpret
    rows = slot_edge.shape[0]
    e_pad, f = msg.shape[-2], msg.shape[-1]
    lead = msg.shape[:-2]
    msg2 = msg.reshape((-1, e_pad, f)).astype(jnp.float32)
    if agg == "max":
        g, mask = slot_gather_operator(slot_edge, slot_mask, e_pad)
        out = _ell_max_impl(msg2, g, mask, d=slot_edge.shape[1],
                            interpret=interpret)
    else:
        s = slot_incidence(slot_edge, slot_mask, e_pad)
        out = _ell_aggregate_impl(msg2, s, interpret=interpret)
    return out.reshape(lead + (rows, f))
