"""Gather / scatter-aggregate backends for Tanner-graph message passing.

The reference's ``MessagePassing.propagate`` does

    collect:   x_i = x[edge_index[1]], x_j = x[edge_index[0]]   (CUDA gather)
    aggregate: scatter_add(msg, edge_index[1], dim_size=N)       (torch_scatter
               atomic CUDA kernel — the hottest op [SURVEY.md §3.3, N1])

Atomic random-index scatter is the wrong primitive for a TPU.  This module
offers interchangeable, *deterministic* backends, parity-tested against each
other (tests/kernels/):

``segment``  — XLA path: gathers via ``take``, aggregation via
               ``jax.ops.segment_sum`` over edges pre-sorted by destination
               row (graph build time), so the reduction is a contiguous
               segmented sum, not a random scatter.
``dense``    — MXU path: QEC Tanner graphs are tiny (d=11 surface code:
               241 nodes / 480 edges) while the batch is huge (B up to 4096),
               so gather and scatter are expressed as one-hot incidence
               matmuls ``[B,N,F] x [N,E]`` that run on the systolic array at
               bf16/f32 throughput.  FLOP count is N x higher than the sparse
               path but the MXU executes them ~100x faster than VPU
               scatter traffic; this wins for small graphs and loses at
               d >~ 17 where O(N*E) growth catches up (bench harness picks).
``ell``      — uniform-degree path: QEC Tanner graphs have bounded degree
               (<= 4 for surface/toric), so every destination row is padded
               to deg_max slots at graph-build time and aggregation becomes
               ``take`` + masked reshape-sum over [rows, deg_max] — *no
               scatter primitive at all*, near-zero padding waste, and every
               op is a dense VPU/MXU-friendly tensor op.
``pallas``   — hand-written fused kernels (tpugnn.kernels) built on the ELL
               layout, used for the fused round loop.

All backends treat padded edges as exact zeros (mask multiplication before
aggregation) and padded rows as dump rows, so padding never changes results
(masking-invariance test: tests/test_mp.py::test_masking_invariance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpugnn.tanner.graph import TannerGraph

__all__ = [
    "gather_endpoints",
    "aggregate_to_checks",
    "aggregate_to_qubits",
    "BACKENDS",
]

BACKENDS = ("segment", "dense", "ell", "pallas")


def _validate_backend(backend: str) -> None:
    if backend not in BACKENDS:
        raise ValueError(f"unknown backend {backend!r}; have {BACKENDS}")


def _check_onehot(graph: TannerGraph) -> jnp.ndarray:
    """f32[E_pad, m_pad] one-hot of edge -> check, zero for padded edges."""
    oh = jax.nn.one_hot(graph.edge_check, graph.n_checks_pad, dtype=jnp.float32)
    return oh * graph.edge_mask[:, None]


def _qubit_onehot(graph: TannerGraph) -> jnp.ndarray:
    oh = jax.nn.one_hot(graph.edge_qubit, graph.n_qubits_pad, dtype=jnp.float32)
    return oh * graph.edge_mask[:, None]


def gather_endpoints(
    graph: TannerGraph,
    x_check: jnp.ndarray,
    x_qubit: jnp.ndarray,
    *,
    backend: str = "segment",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge endpoint features (the reference's ``__collect__`` step).

    x_check: [..., m_pad, F], x_qubit: [..., n_pad, F] ->
    (xc_e, xq_e): [..., E_pad, F] in canonical edge order.
    """
    _validate_backend(backend)
    if backend == "dense":
        xc_e = jnp.einsum(
            "em,...mf->...ef", _check_onehot(graph), x_check,
            preferred_element_type=jnp.float32,
        )
        xq_e = jnp.einsum(
            "en,...nf->...ef", _qubit_onehot(graph), x_qubit,
            preferred_element_type=jnp.float32,
        )
        return xc_e, xq_e
    # segment / pallas: plain XLA gather along the node axis
    xc_e = jnp.take(x_check, graph.edge_check, axis=-2)
    xq_e = jnp.take(x_qubit, graph.edge_qubit, axis=-2)
    mask = graph.edge_mask[:, None]
    return xc_e * mask, xq_e * mask


def _segment_agg(
    msg: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int, agg: str
) -> jnp.ndarray:
    """Segmented reduction along axis -2 (edges), batched over leading dims."""
    red = {
        "sum": partial(jax.ops.segment_sum, num_segments=num_segments),
        "mean": partial(jax.ops.segment_sum, num_segments=num_segments),
        "max": partial(jax.ops.segment_max, num_segments=num_segments),
    }[agg]

    def one(m):
        return red(m, seg_ids)

    out = one(msg) if msg.ndim == 2 else jax.vmap(one)(
        msg.reshape((-1,) + msg.shape[-2:])
    ).reshape(msg.shape[:-2] + (num_segments, msg.shape[-1]))
    if agg == "max":
        # empty (padded) segments produce -inf; zero them without touching
        # real segments that legitimately have negative maxima
        out = jnp.where(jnp.isneginf(out), 0.0, out)
    return out


def _aggregate(
    graph: TannerGraph,
    msg: jnp.ndarray,
    *,
    to: str,
    backend: str,
    agg: str,
) -> jnp.ndarray:
    """msg: [..., E_pad, F] canonical edge order -> [..., rows, F]."""
    _validate_backend(backend)
    if agg not in ("sum", "mean", "max"):
        raise ValueError(f"unknown aggregation {agg!r}; have sum|mean|max")
    msg = msg * graph.edge_mask[:, None]
    if to == "check":
        seg_ids, rows, deg = graph.edge_check, graph.n_checks_pad, graph.check_deg
        onehot = _check_onehot
    else:
        seg_ids, rows, deg = graph.edge_qubit, graph.n_qubits_pad, graph.qubit_deg
        onehot = _qubit_onehot

    if backend in ("ell", "pallas"):
        if to == "check":
            slot_edge, slot_mask = graph.ell_check_edge, graph.ell_check_mask
        else:
            slot_edge, slot_mask = graph.ell_qubit_edge, graph.ell_qubit_mask
        if backend == "pallas":
            from tpugnn.kernels import spmm  # local import: optional backend

            out = spmm.ell_aggregate(msg, slot_edge, slot_mask, agg=agg)
        else:  # XLA ell path
            f = msg.shape[-1]
            sl = jnp.take(msg, slot_edge.reshape(-1), axis=-2)
            sl = sl.reshape(msg.shape[:-2] + slot_edge.shape + (f,))
            if agg == "max":
                sl = jnp.where(slot_mask[..., None] > 0, sl, -jnp.inf)
                out = jnp.max(sl, axis=-2)
                out = jnp.where(jnp.isneginf(out), 0.0, out)
            else:
                out = jnp.sum(sl * slot_mask[..., None], axis=-2)
        if agg == "mean":
            out = out / deg[:, None]
        return out

    if backend == "dense" and agg in ("sum", "mean"):
        out = jnp.einsum(
            "er,...ef->...rf", onehot(graph), msg,
            preferred_element_type=jnp.float32,
        )
        if agg == "mean":
            out = out / deg[:, None]
        return out

    out = _segment_agg(msg, seg_ids, rows, agg)
    if agg == "mean":
        out = out / deg[:, None]
    return out


def global_node_sum(graph, x: jnp.ndarray, *, which: str) -> jnp.ndarray:
    """Masked sum of node features over ALL real nodes: [..., rows, F] -> [..., F].

    On a shard-local graph view (tpugnn.dist), this additionally psums the
    partial over the 'graph' mesh axis so every shard sees the global pool.
    """
    mask = graph.check_mask if which == "check" else graph.qubit_mask
    out = jnp.sum(x * mask[:, None], axis=-2)
    axis = getattr(graph, "mesh_axis", None)
    if axis is not None:
        out = jax.lax.psum(out, axis)
    return out


def aggregate_to_checks(
    graph: TannerGraph, msg: jnp.ndarray, *, backend: str = "segment", agg: str = "sum"
) -> jnp.ndarray:
    """Scatter-aggregate per-edge messages into check rows: [..., m_pad, F]."""
    return _aggregate(graph, msg, to="check", backend=backend, agg=agg)


def aggregate_to_qubits(
    graph: TannerGraph, msg: jnp.ndarray, *, backend: str = "segment", agg: str = "sum"
) -> jnp.ndarray:
    """Scatter-aggregate per-edge messages into qubit rows: [..., n_pad, F]."""
    return _aggregate(graph, msg, to="qubit", backend=backend, agg=agg)
