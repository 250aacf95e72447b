"""On-device noise + syndrome sampling (SURVEY.md C2)."""

from tpugnn.sampling.noise import (
    SyndromeBatch,
    logical_class_bits,
    sample_batch,
    sample_depolarizing,
    syndrome,
)

__all__ = [
    "SyndromeBatch", "sample_batch", "sample_depolarizing", "syndrome",
    "logical_class_bits",
]
