"""Serving: compiled, warmed-up batched decode for deployment."""

from tpugnn.serve.engine import DecodeEngine

__all__ = ["DecodeEngine"]
