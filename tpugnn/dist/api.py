"""User-facing distributed API: sharded apply / train step / dry run.

Composition (TPU-idiomatic, SURVEY.md §2.3):

* outer ``jax.jit`` over the whole train step — the 'data' mesh axis (DP)
  is handled automatically by GSPMD: the syndrome batch is sharded with a
  ``with_sharding_constraint``; gradient psums over 'data' are inserted by
  the compiler.
* inner partial-manual ``jax.shard_map(axis_names={'graph'})`` around the
  decoder forward — the 'graph' axis is edge-partitioned explicitly
  (tpugnn.dist.partition/exchange) while the batch dimension stays under
  GSPMD control.

Multi-host: call :func:`jax.distributed.initialize` first; the same mesh
construction spans hosts (data axis DCN-majority, graph axis ICI-majority,
see tpugnn.dist.mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugnn.configs.config import ExperimentConfig, MeshConfig, ModelConfig, TrainConfig, CodeConfig
from tpugnn.dist.mesh import make_mesh
from tpugnn.dist.partition import PartitionedGraph, build_partitioned_code
from tpugnn.models.decoder import DecoderOutput, GNNDecoder
from tpugnn.tanner.graph import TannerGraph

__all__ = ["make_sharded_apply", "make_sharded_train_step", "dryrun"]


def make_sharded_apply(
    model: GNNDecoder, mesh: Mesh, pgraph: PartitionedGraph
) -> Callable:
    """Graph-parallel ``model.apply``: (params, graph, syndrome) -> DecoderOutput.

    Signature-compatible with ``model.apply`` (the ``graph`` argument is
    accepted and ignored; the closed-over partitioned graph drives the
    sharded forward), so the standard loss/eval code runs unchanged.
    """
    k = pgraph.k

    def inner(params, pg, syndrome):
        view = pg.local()
        out = model.apply(params, view, syndrome)
        ll = out.logical_logits
        if ll is None:
            ll = jnp.zeros((syndrome.shape[0], 2 * k), jnp.float32)
        return out.qubit_logits, ll

    smap = jax.shard_map(
        inner,
        mesh=mesh,
        axis_names={"graph"},
        in_specs=(P(), P("graph"), P(None, "graph")),
        out_specs=(P(None, "graph", None), P()),
    )

    def apply(params, graph, syndrome):
        ql, ll = smap(params, pgraph, syndrome)
        return DecoderOutput(
            qubit_logits=ql,
            logical_logits=None if model.cfg.readout == "per_qubit" else ll,
        )

    return apply


# The TPU compiler leaves all-to-all synchronous by default; this option
# converts halo all-to-alls into async start/done pairs that the
# latency-hiding scheduler overlaps with interior aggregation — verified
# at the scheduled-HLO level by benchmarks/overlap_trace.py (20-30 fusions
# scheduled inside each start/done window on a v5e-8 AOT compile).
TPU_COMPILER_OPTIONS = {"xla_tpu_enable_async_all_to_all": "true"}


def _platform_compiler_options() -> dict | None:
    return TPU_COMPILER_OPTIONS if jax.default_backend() == "tpu" else None


def make_sharded_train_step(
    cfg: ExperimentConfig,
    model: GNNDecoder,
    mesh: Mesh,
    graph: TannerGraph,
    pgraph: PartitionedGraph,
):
    """Full distributed train step: DP over 'data' x graph-parallel forward."""
    import optax

    from tpugnn.sampling.noise import sample_batch
    from tpugnn.train.loop import TrainState, loss_fn, make_optimizer

    opt = make_optimizer(cfg)
    apply_sharded = make_sharded_apply(model, mesh, pgraph)
    batch_shard = NamedSharding(mesh, P("data"))

    @partial(jax.jit, donate_argnums=(0,),
             compiler_options=_platform_compiler_options())
    def step(state: TrainState, graph: TannerGraph):
        key, sub = jax.random.split(state.key)
        batch = sample_batch(sub, graph, cfg.code.p, cfg.train.batch)
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_shard), batch
        )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, apply_sharded, graph, batch, cfg
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, key, state.step + 1), metrics

    return step


def _pick_mesh_shape(n_devices: int) -> MeshConfig:
    graph_ax = 4 if n_devices % 4 == 0 else (2 if n_devices % 2 == 0 else 1)
    return MeshConfig(data=n_devices // graph_ax, graph=graph_ax)


def dryrun(n_devices: int, *, distance: int = 5, family: str = "surface",
           hidden: int = 16, rounds: int = 2, halo: str = "alltoall") -> None:
    """Compile + run ONE sharded training step on tiny shapes (driver hook).

    ``distance`` parameterizes the scale demonstration: d=15+ exercises the
    BASELINE configs[4] multi-host stand-in graph on a virtual CPU mesh
    (tests/dist/test_parity.py runs d=15 x 8 shards; benchmarks/d15_sizing.py
    records the memory budget).
    """
    mcfg = _pick_mesh_shape(n_devices)
    mesh = make_mesh(mcfg, n_devices=n_devices)
    graph, pgraph = build_partitioned_code(family, distance, mcfg.graph,
                                           halo=halo)
    cfg = ExperimentConfig(
        code=CodeConfig(family=family, distance=distance, p=0.05),
        model=ModelConfig(hidden=hidden, msg_hidden=hidden, rounds=rounds),
        train=TrainConfig(batch=max(8, 2 * mcfg.data), steps=1, warmup_steps=1),
    )
    from tpugnn.train.loop import init_state

    state, model = init_state(cfg, graph)
    step = make_sharded_train_step(cfg, model, mesh, graph, pgraph)
    state, metrics = step(state, graph)
    jax.block_until_ready(metrics["loss"])
    print(
        f"dryrun: mesh=(data={mcfg.data}, graph={mcfg.graph}) "
        f"graph={graph.name} loss={float(metrics['loss']):.4f}"
    )
