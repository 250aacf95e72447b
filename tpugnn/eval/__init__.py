"""Monte-Carlo logical-error-rate evaluation (SURVEY.md C6)."""

from tpugnn.eval.hybrid import (
    gnn_cleanup_corrections,
    ler_best_of,
    ler_gnn_cleanup,
    logical_head_correction,
)
from tpugnn.eval.ler import count_failures, decode_corrections, ler_monte_carlo

__all__ = [
    "count_failures",
    "decode_corrections",
    "gnn_cleanup_corrections",
    "ler_best_of",
    "ler_gnn_cleanup",
    "ler_monte_carlo",
    "logical_head_correction",
]
