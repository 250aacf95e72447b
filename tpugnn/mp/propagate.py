"""Functional message-passing engine (the reference's `MessagePassing` core).

The reference implements a PyG-1.x-style class whose ``propagate()`` performs
collect -> message -> scatter-aggregate -> update with the aggregation done by
torch_scatter's atomic CUDA kernels [SURVEY.md §2.1 C3, §3.3].  The TPU-native
equivalent is a *pure function*: no argument-name inspection, no mutable
module state — the caller passes closures and gets new node states back, so
the engine composes directly with jit / vmap / scan / shard_map and the
round loop can be fused on-chip.

Two entry points:

:func:`propagate`        one direction (check->qubit or qubit->check); the
                         semantic twin of the reference's ``propagate()``.
:func:`bipartite_round`  one full BP-style round — messages in both
                         directions plus both node updates; this is the body
                         the decoder runs under ``lax.scan`` (SURVEY.md §3.1
                         hot loop).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from tpugnn.mp.aggregate import (
    aggregate_to_checks,
    aggregate_to_qubits,
    gather_endpoints,
)
from tpugnn.tanner.graph import TannerGraph

__all__ = ["propagate", "bipartite_round", "NodeStates"]

# message_fn(x_check_at_edge, x_qubit_at_edge, edge_attr) -> per-edge message
MessageFn = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]
# update_fn(old_node_state, aggregated_messages) -> new node state
UpdateFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class NodeStates(NamedTuple):
    """Bipartite node states: checks [..., m_pad, F], qubits [..., n_pad, F]."""

    check: jnp.ndarray
    qubit: jnp.ndarray


def propagate(
    graph: TannerGraph,
    x_check: jnp.ndarray,
    x_qubit: jnp.ndarray,
    message_fn: MessageFn,
    *,
    to: str,
    edge_attr: Optional[jnp.ndarray] = None,
    aggr: str = "sum",
    update_fn: Optional[UpdateFn] = None,
    backend: str = "segment",
) -> jnp.ndarray:
    """One directed message-passing step over the Tanner graph.

    Computes per-edge messages from both endpoint features, aggregates them
    into ``to`` in {"check", "qubit"} rows, and optionally applies
    ``update_fn(old_state, aggregated)``.

    Mirrors the reference call
    ``layer.propagate(edge_index, x=h) -> update(scatter(message(x_i, x_j)))``
    [SURVEY.md §3.3] as a pure function.
    """
    if to not in ("check", "qubit"):
        raise ValueError(f"to must be 'check' or 'qubit', got {to!r}")
    if getattr(graph, "mesh_axis", None) is not None:
        # shard-local view under shard_map -> halo-exchange path
        from tpugnn.dist.exchange import sharded_propagate

        return sharded_propagate(
            graph, x_check, x_qubit, message_fn,
            to=to, edge_attr=edge_attr, aggr=aggr, update_fn=update_fn,
        )
    xc_e, xq_e = gather_endpoints(graph, x_check, x_qubit, backend=backend)
    msg = message_fn(xc_e, xq_e, edge_attr)
    if to == "check":
        out = aggregate_to_checks(graph, msg, backend=backend, agg=aggr)
        old = x_check
    else:
        out = aggregate_to_qubits(graph, msg, backend=backend, agg=aggr)
        old = x_qubit
    if update_fn is not None:
        out = update_fn(old, out)
    return out


def bipartite_round(
    graph: TannerGraph,
    state: NodeStates,
    *,
    message_to_qubit: MessageFn,
    message_to_check: MessageFn,
    update_check: UpdateFn,
    update_qubit: UpdateFn,
    edge_attr: Optional[jnp.ndarray] = None,
    aggr: str = "sum",
    backend: str = "segment",
) -> NodeStates:
    """One full BP-style round: both message directions + both node updates.

    Both directions read the *pre-round* states (Jacobi-style simultaneous
    update, matching flooding-schedule belief propagation); the endpoint
    gather is shared between directions, halving the collect cost relative
    to two independent ``propagate`` calls.

    On a shard-local graph view (inside shard_map over the 'graph' mesh
    axis), this transparently routes to the halo-exchange implementation in
    tpugnn.dist.exchange — the calling model code is identical on one chip
    and on a pod slice.
    """
    if getattr(graph, "mesh_axis", None) is not None:
        from tpugnn.dist.exchange import sharded_bipartite_round

        return sharded_bipartite_round(
            graph, state,
            message_to_qubit=message_to_qubit,
            message_to_check=message_to_check,
            update_check=update_check,
            update_qubit=update_qubit,
            edge_attr=edge_attr, aggr=aggr,
        )
    xc_e, xq_e = gather_endpoints(graph, state.check, state.qubit, backend=backend)
    m_q = message_to_qubit(xc_e, xq_e, edge_attr)
    m_c = message_to_check(xc_e, xq_e, edge_attr)
    agg_q = aggregate_to_qubits(graph, m_q, backend=backend, agg=aggr)
    agg_c = aggregate_to_checks(graph, m_c, backend=backend, agg=aggr)
    return NodeStates(
        check=update_check(state.check, agg_c),
        qubit=update_qubit(state.qubit, agg_q),
    )
