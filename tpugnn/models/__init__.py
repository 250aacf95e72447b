"""Decoder model family (SURVEY.md C4)."""

from tpugnn.models.decoder import DecoderOutput, GNNDecoder

__all__ = ["DecoderOutput", "GNNDecoder"]
