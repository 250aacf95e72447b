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

__all__ = ["RoundWeights", "decoder_rounds", "make_operators"]


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
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _make_kernel(M, N, Dc, Dq, H, MH, R):
    def kernel(
        xc_ref, xq_ref, syn_ref,
        g_c_ref, mask_c_ref, deg_c_ref, g_q_ref, mask_q_ref, deg_q_ref,
        *w_refs,
    ):
        out_xc_ref, out_xq_ref = w_refs[-2:]
        w = RoundWeights(*[r[:] for r in w_refs[:-2]])
        xc0 = xc_ref[0]     # [M, H]
        xq0 = xq_ref[0]     # [N, H]
        syn = syn_ref[0]    # [M, 1]
        g_c = g_c_ref[:]
        g_q = g_q_ref[:]
        mask_c = mask_c_ref[:]
        mask_q = mask_q_ref[:]
        deg_c = deg_c_ref[:]
        deg_q = deg_q_ref[:]

        def round_body(_, carry):
            xc, xq = carry
            # --- messages into checks (src = qubits) ---------------------
            yd = _dot(xc, w.wd_c)                       # [M, MH]
            ys = _dot(xq, w.ws_c)                       # [N, MH]
            zs = _dot(g_c, ys)                          # [M*Dc, MH] slot src
            zd = jnp.broadcast_to(yd[:, None, :], (M, Dc, MH)).reshape(M * Dc, MH)
            z = jax.nn.relu(zs + zd + w.b0_c) * mask_c
            hs = jnp.sum(z.reshape(M, Dc, MH), axis=1)  # [M, MH]
            agg_c = _dot(hs, w.wo_c) + deg_c * w.bo_c   # [M, H]
            # --- messages into qubits (src = checks) ---------------------
            yd2 = _dot(xq, w.wd_q)                      # [N, MH]
            ys2 = _dot(xc, w.ws_q)                      # [M, MH]
            zs2 = _dot(g_q, ys2)                        # [N*Dq, MH]
            zd2 = jnp.broadcast_to(yd2[:, None, :], (N, Dq, MH)).reshape(N * Dq, MH)
            z2 = jax.nn.relu(zs2 + zd2 + w.b0_q) * mask_q
            hs2 = jnp.sum(z2.reshape(N, Dq, MH), axis=1)
            agg_q = _dot(hs2, w.wo_q) + deg_q * w.bo_q  # [N, H]
            # --- updates (residual MLP + LayerNorm) ----------------------
            hc = jax.nn.relu(
                _dot(xc, w.uc_x) + _dot(agg_c, w.uc_a) + syn * w.uc_s + w.uc_b0
            )
            xc_new = _ln(xc + _dot(hc, w.uc_w1) + w.uc_b1, w.lnc_scale, w.lnc_bias)
            hq = jax.nn.relu(_dot(xq, w.uq_x) + _dot(agg_q, w.uq_a) + w.uq_b0)
            xq_new = _ln(xq + _dot(hq, w.uq_w1) + w.uq_b1, w.lnq_scale, w.lnq_bias)
            return xc_new, xq_new

        xc, xq = jax.lax.fori_loop(0, R, round_body, (xc0, xq0))
        out_xc_ref[0] = xc
        out_xq_ref[0] = xq

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rounds", "interpret")
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
):
    """Run R fused message rounds; returns (xc_final, xq_final)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m, h = xc0.shape
    n = xq0.shape[1]
    g_c, mask_c, deg_c, g_q, mask_q, deg_q = operators
    dc = g_c.shape[0] // m
    dq = g_q.shape[0] // n
    mh = weights.wd_c.shape[1]

    kernel = _make_kernel(m, n, dc, dq, h, mh, rounds)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    sample_spec = lambda rows, f: pl.BlockSpec(
        (1, rows, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    ops = (g_c, mask_c, deg_c, g_q, mask_q, deg_q)
    flops_round = 2 * (
        m * h * mh + n * h * mh + m * dc * n * mh + n * h * mh + m * h * mh
        + n * dq * m * mh + m * mh * h + n * mh * h + 4 * m * h * h + 4 * n * h * h
    )
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, m, h), jnp.float32),
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                sample_spec(m, h),
                sample_spec(n, h),
                sample_spec(m, 1),
                *[full(o) for o in ops],
                *[full(x) for x in weights],
            ],
            out_specs=(sample_spec(m, h), sample_spec(n, h)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * rounds * flops_round,
            bytes_accessed=4 * b * (2 * (m + n) * h + m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xc0.astype(jnp.float32), xq0.astype(jnp.float32), syn.astype(jnp.float32),
        *ops, *weights,
    )
    return out
