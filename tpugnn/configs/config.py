"""Frozen config dataclasses (the reference's argparse flags, typed).

The reference drives everything through argparse ``__main__`` flags
[SURVEY.md §2.1 C7]; here every knob is a hashable frozen dataclass so a
config can (a) be a static argument to jit — one compile per distinct config
— and (b) hash into checkpoint / compile-cache keys.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

__all__ = ["CodeConfig", "ModelConfig", "TrainConfig", "MeshConfig", "ExperimentConfig"]


@dataclass(frozen=True)
class CodeConfig:
    """Which QEC code instance to decode."""

    family: str = "surface"         # surface | toric | repetition
    distance: int = 3
    p: float = 0.05                 # depolarizing rate (training / eval default)
    pad_nodes: int = 8
    pad_edges: int = 128


@dataclass(frozen=True)
class ModelConfig:
    """GNN decoder architecture (SURVEY.md §2.1 C4)."""

    hidden: int = 128               # node state width
    msg_hidden: int = 128           # edge-message MLP hidden width
    rounds: int = 8                 # fixed BP-style message-round count
    weight_tied: bool = True        # one cell reused every round (BP-like)
    update: str = "mlp"             # mlp (residual MLP + LayerNorm) | gru
                                    # (GRU cell over node states; generic
                                    # backends only)
    aggr: str = "sum"               # sum | mean | max
    backend: str = "segment"        # segment | dense | ell | fused | pallas
    remat: bool = False             # jax.checkpoint each round (trade FLOPs
                                    # for activation memory in training)
    readout: str = "both"           # per_qubit | logical | both
    qubit_head: str = "bits"        # bits (2 sigmoid: ex, ez) | pauli4
                                    # (4-way softmax I/X/Z/Y; models the
                                    # X-Z correlation of Y errors)
    dtype: str = "float32"          # activation dtype ("bfloat16" for perf)


@dataclass(frozen=True)
class TrainConfig:
    batch: int = 256
    steps: int = 2000
    lr: float = 1e-3
    warmup_steps: int = 100
    weight_decay: float = 1e-4
    seed: int = 0
    loss_qubit_weight: float = 1.0
    loss_logical_weight: float = 1.0
    eval_every: int = 500
    eval_shots: int = 4096
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1000
    metrics_jsonl: Optional[str] = None   # structured metrics sink (JSONL)
    profile_dir: Optional[str] = None     # jax.profiler trace of steps 10..14
    # linear noise curriculum (p_from, p_to, over_steps); None = fixed code.p
    p_curriculum: Optional[Tuple[float, float, int]] = None
    # per-SHOT noise-rate mixing: each training sample draws its own
    # p ~ Uniform[lo, hi] (trains one decoder for a whole p range instead
    # of one operating point); mutually exclusive with p_curriculum
    p_mix: Optional[Tuple[float, float]] = None
    # EMA of params for eval/serving (e.g. 0.999); kept OUTSIDE TrainState
    # (old checkpoints stay restorable), saved under checkpoint_dir/ema
    ema_decay: Optional[float] = None


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (SURVEY.md §2.3/§2.4).

    ``data`` shards the syndrome batch (DP); ``graph`` edge-partitions the
    Tanner graph (the GNN analog of TP/SP).  On multi-host slices the data
    axis should span DCN and the graph axis stay within ICI.
    """

    data: int = 1
    graph: int = 1
    axis_names: Tuple[str, str] = ("data", "graph")


@dataclass(frozen=True)
class ExperimentConfig:
    code: CodeConfig = CodeConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)
