"""PyG-style ``MessagePassing`` adapter over the functional engine.

The reference's public API is a class users subclass, overriding
``message`` / ``update`` and calling ``propagate`` [SURVEY.md §2.1 C3:
``MessagePassing.__init__(aggr, flow)``, ``.propagate``, ``.message``,
``.update``].  The TPU-native engine is the *pure function*
:func:`tpugnn.mp.propagate` (no argument-name inspection, no module
state), which is what the models actually run; this adapter exists so
code written against the reference's class API ports line-for-line:

    class BPLayer(MessagePassing):
        def __init__(self):
            super().__init__(aggr="sum", flow="qubit->check")
        def message(self, x_i, x_j, edge_attr):
            return jnp.tanh(x_i + x_j)          # x_i = dst, x_j = src
        def update(self, aggr_out, x):
            return x + aggr_out

    layer = BPLayer()
    new_checks = layer.propagate(graph, x_check=xc, x_qubit=xq)

Differences from torch-geometric, by design (TPU semantics):

* graphs are the bipartite :class:`~tpugnn.tanner.graph.TannerGraph`
  (padded static shapes), not an arbitrary ``edge_index`` tensor — the
  flow is named ``"qubit->check"`` / ``"check->qubit"`` instead of
  source_to_target/target_to_source index juggling;
* no argument-name inspection: ``message`` always receives
  ``(x_i, x_j, edge_attr)`` with ``x_i`` the destination endpoint and
  ``x_j`` the source endpoint (PyG's convention), ``update`` receives
  ``(aggr_out, x_dst)``;
* everything stays pure — the adapter just forwards to the functional
  engine, so instances compose with jit/vmap/scan/shard_map and run on
  every backend including the sharded halo-exchange path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tpugnn.mp.propagate import propagate as _propagate
from tpugnn.tanner.graph import TannerGraph

__all__ = ["MessagePassing"]


class MessagePassing:
    """Subclassable twin of the reference's MessagePassing base class."""

    def __init__(self, aggr: str = "sum", flow: str = "qubit->check",
                 backend: str = "segment"):
        if aggr not in ("sum", "mean", "max"):
            raise ValueError(f"aggr must be sum|mean|max, got {aggr!r}")
        if flow not in ("qubit->check", "check->qubit"):
            raise ValueError(
                f"flow must be 'qubit->check' or 'check->qubit', got {flow!r}")
        self.aggr = aggr
        self.flow = flow
        self.backend = backend

    # -- override points ----------------------------------------------------

    def message(self, x_i: jnp.ndarray, x_j: jnp.ndarray,
                edge_attr: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Per-edge message from destination (x_i) and source (x_j) features."""
        return x_j

    def update(self, aggr_out: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """New destination-node state from aggregated messages + old state."""
        return aggr_out

    # -- engine -------------------------------------------------------------

    def propagate(
        self,
        graph: TannerGraph,
        *,
        x_check: jnp.ndarray,
        x_qubit: jnp.ndarray,
        edge_attr: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """collect -> message -> scatter-aggregate -> update, one direction.

        Returns the updated destination-node states (checks for
        flow='qubit->check', qubits otherwise).
        """
        to = "check" if self.flow == "qubit->check" else "qubit"

        def message_fn(xc_e, xq_e, ea):
            x_i, x_j = (xc_e, xq_e) if to == "check" else (xq_e, xc_e)
            return self.message(x_i, x_j, ea)

        return _propagate(
            graph, x_check, x_qubit, message_fn,
            to=to, edge_attr=edge_attr, aggr=self.aggr,
            update_fn=lambda old, agg: self.update(agg, old),
            backend=self.backend,
        )

    def __call__(self, graph, x_check, x_qubit, edge_attr=None):
        return self.propagate(graph, x_check=x_check, x_qubit=x_qubit,
                              edge_attr=edge_attr)
