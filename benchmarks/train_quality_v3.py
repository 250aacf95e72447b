"""Flagship quality runs: train d=7/9/11 surface-code decoders on the TPU.

Sequential training runs (one compile per distance) with checkpoints into
runs/v3_surface_d{d}; follow with benchmarks/ler_table.py to regenerate the
LER parity table at d=3..11.  Settings mirror the v2 CPU runs (fused
backend, pauli4 qubit head, both heads in the loss) scaled up to the
hardware batch.

    python benchmarks/train_quality_v3.py [--ds 7 9 11] [--steps 8000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ds", type=int, nargs="+", default=[7, 9, 11])
    ap.add_argument("--family", default="surface",
                    help="code family (surface | toric | repetition)")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--p", type=float, default=0.05)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out-prefix", default="runs/v3_surface_d")
    ap.add_argument("--remat", action="store_true",
                    help="per-round activation rematerialization (needed for "
                         "d >= 9 at batch 4096 on a 16G chip)")
    ap.add_argument("--ema", type=float, default=None, metavar="DECAY",
                    help="maintain an EMA of the params (e.g. 0.999); "
                         "reported as ler_ema, saved under <out>/ema")
    ap.add_argument("--p-mix", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="per-shot training noise rate ~ Uniform[LO, HI]")
    ap.add_argument("--backend", default="fused",
                    help="model backend (fused | pallas; pallas trains "
                         "through the fused fwd+bwd kernels)")
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (params stay f32; bfloat16 for the "
                         "pallas kernel path)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
    from tpugnn.train import train

    for d in args.ds:
        out = f"{args.out_prefix}{d}"
        cfg = ExperimentConfig(
            code=CodeConfig(family=args.family, distance=d, p=args.p),
            model=ModelConfig(
                hidden=args.hidden, msg_hidden=args.hidden, rounds=args.rounds,
                backend=args.backend, readout="both", qubit_head="pauli4",
                remat=args.remat, dtype=args.dtype,
            ),
            train=TrainConfig(
                batch=args.batch, steps=args.steps, lr=args.lr,
                warmup_steps=200, eval_every=1000, eval_shots=8192,
                checkpoint_dir=os.path.abspath(out),
                metrics_jsonl=os.path.join(out, "metrics.jsonl"),
                ema_decay=args.ema,
                p_mix=tuple(args.p_mix) if args.p_mix else None,
            ),
        )
        t0 = time.time()
        print(f"=== d={d} -> {out} ===", flush=True)
        state, model, graph, history = train(cfg, log=lambda s: print(s, flush=True))
        el = time.time() - t0
        last = history[-1] if history else {}
        print(json.dumps({
            "d": d, "steps": args.steps, "wall_s": round(el, 1),
            "final": {k: last.get(k) for k in ("loss", "ler", "ler_logical",
                                               "ler_hybrid", "ler_ema",
                                               "ler_hybrid_ema")},
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
