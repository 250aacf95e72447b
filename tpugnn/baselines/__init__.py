"""Classical baseline decoders for LER comparison (SURVEY.md C6)."""

from tpugnn.baselines.bp import bp_decode, bp_posteriors
from tpugnn.baselines.mwpm import MWPMDecoder, MWPMSectorDecoder
from tpugnn.baselines.osd import BPOSDDecoder, osd0_py
from tpugnn.baselines.union_find import UnionFindDecoder, uf_decode_py

__all__ = ["UnionFindDecoder", "uf_decode_py", "bp_decode", "bp_posteriors",
           "BPOSDDecoder", "osd0_py", "MWPMDecoder", "MWPMSectorDecoder"]
