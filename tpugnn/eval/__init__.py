"""Monte-Carlo logical-error-rate evaluation (SURVEY.md C6)."""

from tpugnn.eval.ler import count_failures, decode_corrections, ler_monte_carlo

__all__ = ["count_failures", "decode_corrections", "ler_monte_carlo"]
