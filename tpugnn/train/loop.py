"""Training loop: optax + one fused jitted step, sampling on-device.

The reference runs a classic torch loop — host-side sampling, H2D transfer,
forward/backward, ``optimizer.step()`` [SURVEY.md §3.1 C5].  The TPU-native
loop fuses *everything* into a single donated jit step: threefry key split,
depolarizing sampling, syndrome extraction, decoder forward, loss, backward
and the optax update all compile into one XLA program, so steady-state
training does zero host<->device transfers (the host only reads back scalar
metrics when asked).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpugnn.configs.config import ExperimentConfig
from tpugnn.eval.ler import ler_monte_carlo
from tpugnn.models.decoder import GNNDecoder
from tpugnn.sampling.noise import sample_batch
from tpugnn.tanner import build_code
from tpugnn.tanner.graph import TannerGraph

__all__ = ["TrainState", "make_train_step", "loss_fn", "train", "init_state"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    step: jnp.ndarray  # i32 scalar


def _masks(graph: TannerGraph):
    qm = (jnp.arange(graph.n_qubits_pad) < graph.n_qubits).astype(jnp.float32)
    return qm


def loss_fn(params, apply_fn, graph: TannerGraph, batch, cfg: ExperimentConfig):
    """Masked BCE on per-qubit error bits + BCE on logical class bits."""
    out = apply_fn(params, graph, batch.syndrome)
    qm = _masks(graph)
    total = 0.0
    metrics = {}
    if out.qubit_logits is not None and cfg.train.loss_qubit_weight:
        if out.qubit_logits.shape[-1] == 4:
            # Pauli softmax head: class index = ex + 2*ez over [I, X, Z, Y]
            labels = (batch.ex + 2.0 * batch.ez).astype(jnp.int32)
            per = optax.softmax_cross_entropy_with_integer_labels(
                out.qubit_logits, labels
            ) * qm
            lq = jnp.sum(per) / (batch.syndrome.shape[0] * graph.n_qubits)
            hard = jnp.argmax(out.qubit_logits, axis=-1)
            acc = jnp.sum((hard == labels) * qm) / (
                batch.syndrome.shape[0] * graph.n_qubits
            )
        else:
            targets = jnp.stack([batch.ex, batch.ez], axis=-1)  # [B, n_pad, 2]
            per = optax.sigmoid_binary_cross_entropy(out.qubit_logits, targets)
            per = per * qm[:, None]
            lq = jnp.sum(per) / (batch.syndrome.shape[0] * graph.n_qubits * 2)
            hard = (out.qubit_logits > 0).astype(jnp.float32)
            acc = jnp.sum((hard == targets) * qm[:, None]) / (
                batch.syndrome.shape[0] * graph.n_qubits * 2
            )
        total = total + cfg.train.loss_qubit_weight * lq
        metrics["loss_qubit"] = lq
        metrics["acc_qubit"] = acc
    if out.logical_logits is not None and cfg.train.loss_logical_weight:
        ll = jnp.mean(
            optax.sigmoid_binary_cross_entropy(out.logical_logits, batch.class_bits)
        )
        total = total + cfg.train.loss_logical_weight * ll
        metrics["loss_logical"] = ll
    metrics["loss"] = total
    return total, metrics


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.train.lr,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(cfg.train.steps, cfg.train.warmup_steps + 1),
        end_value=cfg.train.lr * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=cfg.train.weight_decay),
    )


def _resolve_model(cfg: ExperimentConfig, graph: TannerGraph):
    """Model + apply_fn for the configured backend.

    backend='pallas' trains through the fused kernel (custom VJP; params in
    the 'fused' layout); every other backend trains the flax module
    directly.
    """
    import dataclasses

    if cfg.model.backend == "pallas":
        from tpugnn.models.pallas_decoder import PallasDecoder

        fused_cfg = dataclasses.replace(cfg.model, backend="fused")
        model = GNNDecoder(fused_cfg, k=graph.k)
        apply_fn = PallasDecoder(fused_cfg, k=graph.k, trainable=True).apply
        return model, apply_fn
    model = GNNDecoder(cfg.model, k=graph.k)
    return model, model.apply


def init_state(cfg: ExperimentConfig, graph: TannerGraph):
    """Initialize model params + optimizer state; returns (state, model)."""
    model, _ = _resolve_model(cfg, graph)
    key = jax.random.PRNGKey(cfg.train.seed)
    key, pkey, skey = jax.random.split(key, 3)
    dummy_syndrome = jnp.zeros((2, graph.n_checks_pad), jnp.float32)
    params = model.init(pkey, graph, dummy_syndrome)
    opt = make_optimizer(cfg)
    state = TrainState(
        params=params,
        opt_state=opt.init(params),
        key=skey,
        step=jnp.zeros((), jnp.int32),
    )
    return state, model


def make_train_step(cfg: ExperimentConfig, model: GNNDecoder):
    """One fused train step: sample -> forward -> backward -> update."""
    opt = make_optimizer(cfg)
    if cfg.model.backend == "pallas":
        import dataclasses

        from tpugnn.models.pallas_decoder import PallasDecoder

        fused_cfg = dataclasses.replace(cfg.model, backend="fused")
        apply_fn = PallasDecoder(fused_cfg, k=model.k, trainable=True).apply
    else:
        apply_fn = model.apply

    if cfg.train.p_curriculum is not None and cfg.train.p_mix is not None:
        raise ValueError("p_curriculum and p_mix are mutually exclusive")

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, graph: TannerGraph):
        key, sub = jax.random.split(state.key)
        if cfg.train.p_curriculum is not None:
            p0, p1, over = cfg.train.p_curriculum
            frac = jnp.minimum(state.step.astype(jnp.float32) / max(over, 1), 1.0)
            p = p0 + (p1 - p0) * frac
        elif cfg.train.p_mix is not None:
            # per-shot rate: [B, 1] broadcasts against the [B, n_pad]
            # uniform draw inside sample_depolarizing
            sub, psub = jax.random.split(sub)
            lo, hi = cfg.train.p_mix
            p = jax.random.uniform(psub, (cfg.train.batch, 1),
                                   minval=lo, maxval=hi)
        else:
            p = cfg.code.p
        batch = sample_batch(sub, graph, p, cfg.train.batch)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, apply_fn, graph, batch, cfg
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, key=key, step=state.step + 1
        )
        return new_state, metrics

    return step


def train(cfg: ExperimentConfig, *, graph: TannerGraph | None = None, log=print):
    """Full training run; returns (state, model, graph, history)."""
    if graph is None:
        graph = build_code(
            cfg.code.family,
            cfg.code.distance,
            pad_nodes=cfg.code.pad_nodes,
            pad_edges=cfg.code.pad_edges,
        )
    state, model = init_state(cfg, graph)
    step_fn = make_train_step(cfg, model)
    history = []
    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        from tpugnn.train.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored
            log(f"restored checkpoint at step {int(state.step)}")

    # optional EMA of params (eval/serving); lives OUTSIDE TrainState so
    # existing checkpoints stay restorable, persisted under <ckpt>/ema
    ema_params = None
    ema_mgr = None
    ema_step = None
    if cfg.train.ema_decay:
        import os as _os

        decay = float(cfg.train.ema_decay)
        # deep copy: the train step donates state, so aliasing state.params
        # here would leave ema_params pointing at deleted buffers
        ema_params = jax.tree_util.tree_map(jnp.copy, state.params)
        if cfg.train.checkpoint_dir:
            from tpugnn.train.checkpoint import CheckpointManager

            ema_mgr = CheckpointManager(
                _os.path.join(cfg.train.checkpoint_dir, "ema"))
            r = ema_mgr.restore_latest(state)
            if r is not None:
                ema_params = r.params
        ema_step = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda x, y: decay * x + (1.0 - decay) * y, e, p))

    from tpugnn.utils.metrics import MetricLogger

    jl = (
        MetricLogger(cfg.train.metrics_jsonl, stdout=False)
        if cfg.train.metrics_jsonl
        else None
    )
    start = int(state.step)
    for i in range(start, cfg.train.steps):
        if cfg.train.profile_dir and i == 10:
            jax.profiler.start_trace(cfg.train.profile_dir)
        state, metrics = step_fn(state, graph)
        if ema_step is not None:
            ema_params = ema_step(ema_params, state.params)
        if cfg.train.profile_dir and i == 14:
            from tpugnn.utils.timing import hard_sync

            hard_sync(metrics["loss"])
            jax.profiler.stop_trace()
        if (i + 1) % max(1, cfg.train.eval_every) == 0 or i + 1 == cfg.train.steps:
            m = {k: float(v) for k, v in metrics.items()}
            ev = ler_monte_carlo(
                model.apply,
                state.params,
                graph,
                p=cfg.code.p,
                shots=cfg.train.eval_shots,
                batch=min(cfg.train.eval_shots, 1024),
                key=jax.random.PRNGKey(1000 + i),
            )
            m.update({"step": i + 1, "ler": ev["ler"], "ler_stderr": ev["ler_stderr"]})
            for extra in ("ler_logical", "ler_hybrid"):
                if extra in ev:
                    m[extra] = ev[extra]
            if ema_params is not None:
                ev_ema = ler_monte_carlo(
                    model.apply, ema_params, graph,
                    p=cfg.code.p, shots=cfg.train.eval_shots,
                    batch=min(cfg.train.eval_shots, 1024),
                    key=jax.random.PRNGKey(1000 + i),
                )
                m["ler_ema"] = ev_ema["ler"]
                if "ler_hybrid" in ev_ema:
                    m["ler_hybrid_ema"] = ev_ema["ler_hybrid"]
            history.append(m)
            if jl is not None:
                jl.log(m)
            log(
                f"step {i + 1}: loss={m['loss']:.4f} ler={m['ler']:.4f}"
                + (f" ler_logical={m['ler_logical']:.4f}" if "ler_logical" in m else "")
            )
        if ckpt_mgr is not None and (i + 1) % cfg.train.checkpoint_every == 0:
            ckpt_mgr.save(state)
            if ema_mgr is not None:
                ema_mgr.save(state._replace(params=ema_params))
    if ckpt_mgr is not None:
        ckpt_mgr.save(state)
        ckpt_mgr.wait()
        if ema_mgr is not None:
            ema_mgr.save(state._replace(params=ema_params))
            ema_mgr.wait()
    return state, model, graph, history
