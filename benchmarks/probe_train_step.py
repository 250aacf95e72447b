"""Probe: full training-step time, XLA fused backend vs Pallas-VJP path.

Times one optimizer step (sample -> forward -> backward -> adamw update,
donated state) for the flagship d=11 config on the real chip, comparing:

  fused   — XLA 'fused' backend, flax autodiff (the production default)
  pallas  — PallasDecoder(trainable=True, backward='pallas'): fused Pallas
            forward + hand-written fused Pallas backward
  pallas-xla — kernel forward, rematerialized XLA backward (the old
            trainable path), for attribution

    python benchmarks/probe_train_step.py [--d 11] [--batch 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpugnn.utils.timing import hard_sync


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--paths", nargs="+",
                    default=["pallas", "fused", "pallas-xla"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    import optax

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
    from tpugnn.models import GNNDecoder
    from tpugnn.models.pallas_decoder import PallasDecoder
    from tpugnn.sampling.noise import sample_batch
    from tpugnn.tanner import build_code
    from tpugnn.train.loop import TrainState, init_state, loss_fn, make_optimizer

    graph = build_code("surface", args.d)
    edges = args.batch * graph.n_edges * args.rounds

    for path in args.paths:
        cfg = ExperimentConfig(
            code=CodeConfig(family="surface", distance=args.d, p=0.05),
            model=ModelConfig(
                hidden=args.hidden, msg_hidden=args.hidden, rounds=args.rounds,
                backend="fused", readout="both", qubit_head="pauli4",
                dtype=args.dtype if path != "fused" else "float32",
                remat=args.remat,
            ),
            train=TrainConfig(batch=args.batch, steps=1, warmup_steps=1),
        )
        state, model = init_state(cfg, graph)
        if path == "fused":
            apply_fn = model.apply
        else:
            apply_fn = PallasDecoder(
                cfg.model, k=graph.k, trainable=True,
                backward="pallas" if path == "pallas" else "xla",
            ).apply
        opt = make_optimizer(cfg)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, graph):
            key, sub = jax.random.split(state.key)
            batch = sample_batch(sub, graph, cfg.code.p, cfg.train.batch)
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, apply_fn, graph, batch, cfg
            )
            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.key, state.step + 1), metrics

        try:
            t0 = time.perf_counter()
            state, metrics = step(state, graph)
            hard_sync(metrics["loss"])
            compile_s = time.perf_counter() - t0
            # SIGSTOP any queue-advertised background job for the timed
            # region (TPU timings are garbage while the host is busy —
            # PERF_NOTES; the r2e/r2f probes were voided by exactly this)
            from contextlib import nullcontext

            from tpugnn.utils.hostidle import paused_queue_jobs

            pause = (paused_queue_jobs() if jax.default_backend() == "tpu"
                     else nullcontext([]))
            with pause as paused:
                if paused:
                    print(f"paused queue jobs: {paused}", file=sys.stderr)
                ts = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    for _ in range(args.chain):
                        state, metrics = step(state, graph)
                    hard_sync(metrics["loss"])
                    ts.append((time.perf_counter() - t0) / args.chain)
            t = statistics.median(ts)
            print(json.dumps({
                "path": path, "step_ms": round(t * 1e3, 2),
                "medges_per_s": round(edges / t / 1e6, 1),
                "compile_s": round(compile_s, 1),
                "loss": round(float(metrics["loss"]), 4),
            }), flush=True)
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(json.dumps({"path": path,
                              "error": f"{type(e).__name__}: {str(e)[-300:]}"}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
