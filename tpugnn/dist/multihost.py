"""Multi-host initialization + launch helpers (BASELINE.json configs[4]).

The reference is single-process [SURVEY.md §2.3]; scaling to N >= 2 hosts is
new capability.  JAX's runtime handles cross-host SPMD transparently once
``jax.distributed.initialize`` has run on every process: the same
('data', 'graph') mesh then spans all hosts, GSPMD routes the data-axis
gradient psum over DCN and the graph-axis halo all_to_all over ICI
(tpugnn.dist.mesh puts 'graph' on the fastest, last mesh axis).

Typical launch (one process per host):

    # TPU pod slice (coordinator inferred from the TPU environment)
    python -c "import tpugnn.dist.multihost as mh; mh.initialize(); ..."

    # explicit coordinator (e.g. CPU multi-process testing)
    JAX_COORD=host0:1234 JAX_NUM_PROC=2 JAX_PROC_ID=$i python train.py

Per-host batch sharding: keep ``TrainConfig.batch`` divisible by the global
'data' axis size; each host samples its own shard on-device (threefry keys
are counter-based, so shards are independent without host communication).
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize", "is_multihost", "process_info"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments on a TPU pod slice, everything is inferred from the
    TPU metadata environment.  Explicit values (or JAX_COORD / JAX_NUM_PROC
    / JAX_PROC_ID env vars) support CPU/GPU multi-process runs and tests.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORD")
    if num_processes is None and "JAX_NUM_PROC" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROC"])
    if process_id is None and "JAX_PROC_ID" in os.environ:
        process_id = int(os.environ["JAX_PROC_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
