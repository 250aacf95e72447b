"""Functional message-passing engine (SURVEY.md C3)."""

from tpugnn.mp.aggregate import (
    BACKENDS,
    aggregate_to_checks,
    aggregate_to_qubits,
    gather_endpoints,
)
from tpugnn.mp.message_passing import MessagePassing
from tpugnn.mp.propagate import NodeStates, bipartite_round, propagate

__all__ = [
    "BACKENDS", "MessagePassing", "NodeStates", "aggregate_to_checks",
    "aggregate_to_qubits", "bipartite_round", "gather_endpoints", "propagate",
]
