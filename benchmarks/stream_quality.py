"""Streaming-decode quality: GNN sliding windows vs streaming union-find.

Loads a spacetime-trained GNN checkpoint (benchmarks/train_quality_circuit
--noise phenomenological writes runs/spacetime_{family}_d{d}_t{dt}) as the
window decoder of a SlidingWindowDecoder and measures Monte-Carlo logical
error rate over long syndrome streams against the union-find baseline in
the SAME windowed setting (and monolithic union-find as the upper bound).

    python benchmarks/stream_quality.py \
        --runs runs/spacetime_surface_d3_t3:surface:3:3:96 \
        --commit 1 --total-rounds 9 --ps 0.01 0.02 --shots 20000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", action="append", required=True,
                    help="ckpt_dir:family:d:window[:hidden[:rounds]]")
    ap.add_argument("--commit", type=int, default=1,
                    help="rounds committed per window slide")
    ap.add_argument("--total-rounds", type=int, default=None,
                    help="stream length (default: window + 6*commit)")
    ap.add_argument("--ps", type=float, nargs="+", default=[0.01, 0.02, 0.03])
    ap.add_argument("--shots", type=int, default=20_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
    from tpugnn.streaming import SlidingWindowDecoder, stream_ler
    from tpugnn.train.checkpoint import CheckpointManager
    from tpugnn.train.loop import init_state

    for spec in args.runs:
        parts = spec.split(":")
        ckpt, family, d, window = parts[0], parts[1], int(parts[2]), int(parts[3])
        hidden = int(parts[4]) if len(parts) > 4 else 96
        rounds = int(parts[5]) if len(parts) > 5 else 8
        total = args.total_rounds or (window + 6 * args.commit)
        cfg = ExperimentConfig(
            code=CodeConfig(family=family, distance=d),
            model=ModelConfig(hidden=hidden, msg_hidden=hidden, rounds=rounds,
                              backend="fused", readout="both"),
        )
        gnn_stream = SlidingWindowDecoder(
            family, d, window=window, commit=args.commit)
        state, model = init_state(cfg, gnn_stream.graph)
        restored = CheckpointManager(ckpt).restore_latest(state)
        if restored is None:
            print(f"skip {spec}: no checkpoint", file=sys.stderr)
            continue
        gnn_stream = SlidingWindowDecoder.from_gnn(
            family, d, window=window, commit=args.commit,
            apply_fn=model.apply, params=restored.params)
        gnn_clean = SlidingWindowDecoder.from_gnn_cleanup(
            family, d, window=window, commit=args.commit,
            apply_fn=model.apply, params=restored.params)
        uf_stream = SlidingWindowDecoder.from_union_find(
            family, d, window=window, commit=args.commit)
        uf_mono = SlidingWindowDecoder.from_union_find(
            family, d, window=total, commit=total)
        for p in args.ps:
            g = stream_ler(gnn_stream, p=p, rounds=total, shots=args.shots,
                           seed=11, batch=args.batch)
            gc = stream_ler(gnn_clean, p=p, rounds=total, shots=args.shots,
                            seed=11, batch=args.batch)
            u = stream_ler(uf_stream, p=p, rounds=total, shots=args.shots,
                           seed=11, batch=args.batch)
            um = stream_ler(uf_mono, p=p, rounds=total, shots=args.shots,
                            seed=11, batch=args.batch)
            print(json.dumps({
                "family": family, "d": d, "window": window,
                "commit": args.commit, "total_rounds": total, "p": p,
                "gnn_stream": g["ler"], "gnn_uf_stream": gc["ler"],
                "uf_stream": u["ler"],
                "uf_monolithic": um["ler"], "stderr": g["ler_stderr"],
                "shots": args.shots,
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
