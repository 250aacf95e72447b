"""Distributed execution: mesh, edge partitioner, halo exchange (SURVEY.md §2.4)."""

from tpugnn.dist.api import dryrun, make_sharded_apply, make_sharded_train_step
from tpugnn.dist.mesh import make_mesh
from tpugnn.dist.partition import (
    LocalGraphView,
    PartitionedGraph,
    build_partitioned_code,
    partition_graph,
)

__all__ = [
    "dryrun", "make_sharded_apply", "make_sharded_train_step", "make_mesh",
    "LocalGraphView", "PartitionedGraph", "build_partitioned_code", "partition_graph",
]
