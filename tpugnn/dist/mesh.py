"""Device-mesh construction and axis conventions (SURVEY.md §2.4).

Axis names:
    'data'  — shards the syndrome batch (DP). On multi-host slices this is
              the DCN-majority axis: gradient psum tolerates DCN latency.
    'graph' — partitions the Tanner graph (edge/contraction dimension); its
              collectives run every message round, so it must map onto ICI.

``jax.make_mesh`` orders devices so the *last* axis is ICI-contiguous;
putting 'graph' last therefore gives it the fastest links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugnn.configs.config import MeshConfig

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(
    cfg: MeshConfig | None = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    n_devices: Optional[int] = None,
) -> Mesh:
    """Build the ('data', 'graph') mesh.

    With no config, uses all devices on the data axis.  ``n_devices`` limits
    the device count (e.g. for dry runs on a forced CPU platform).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if cfg is None:
        cfg = MeshConfig(data=len(devs), graph=1)
    want = cfg.data * cfg.graph
    if want > len(devs):
        raise ValueError(f"mesh {cfg.data}x{cfg.graph} needs {want} devices, have {len(devs)}")
    import numpy as np

    arr = np.array(devs[:want]).reshape(cfg.data, cfg.graph)
    return Mesh(arr, axis_names=cfg.axis_names)


def data_sharding(mesh: Mesh, *, batch_axis: int = 0, ndim: int = 2) -> NamedSharding:
    """Shard the leading batch dimension over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
