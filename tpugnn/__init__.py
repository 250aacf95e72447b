"""tpugnn: TPU-native GNN message-passing framework for QEC decoding.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
ironmanaudi/GNN-decode reference (see SURVEY.md): Tanner-graph construction
for surface/toric codes, on-device syndrome sampling, a functional
message-passing engine with deterministic segmented aggregation (Pallas
SpMM/SDDMM kernels on TPU), a BP-style GNN decoder, training + Monte-Carlo
logical-error-rate evaluation, and edge-partitioned multi-chip execution
over jax.sharding meshes.
"""

__version__ = "0.1.0"

from tpugnn.configs.config import (
    CodeConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from tpugnn.tanner import build_code
from tpugnn.tanner.graph import TannerGraph

__all__ = [
    "CodeConfig", "ExperimentConfig", "MeshConfig", "ModelConfig",
    "TrainConfig", "TannerGraph", "build_code",
]
