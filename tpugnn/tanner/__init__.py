"""Code families -> padded device-resident Tanner graphs (SURVEY.md C1)."""

from tpugnn.tanner.circuit import build_circuit_code
from tpugnn.tanner.graph import TannerGraph, build_tanner_graph
from tpugnn.tanner.repetition import build_repetition_code, repetition_code_checks
from tpugnn.tanner.steane import build_steane_code, steane_code_checks
from tpugnn.tanner.surface import build_surface_code, surface_code_checks
from tpugnn.tanner.toric import build_toric_code, toric_code_checks

_FAMILIES = {
    "surface": build_surface_code,
    "toric": build_toric_code,
    "repetition": build_repetition_code,
    "steane": build_steane_code,
}


def build_code(family: str, distance: int, **kw) -> TannerGraph:
    """Build any registered code family by name."""
    try:
        builder = _FAMILIES[family]
    except KeyError:
        raise ValueError(f"unknown code family {family!r}; have {sorted(_FAMILIES)}")
    return builder(distance, **kw)


__all__ = [
    "TannerGraph", "build_tanner_graph", "build_code",
    "build_surface_code", "build_toric_code", "build_repetition_code",
    "build_steane_code", "build_circuit_code", "surface_code_checks",
    "toric_code_checks", "repetition_code_checks", "steane_code_checks",
]
