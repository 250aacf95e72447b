"""Serving latency: decode time vs request batch size.

Production decoding cares about per-request latency at small batches (a
fault-tolerant machine decodes one syndrome stream per logical qubit, not a
4096-wide Monte-Carlo batch).  This harness measures the DecodeEngine at
several compiled batch sizes and reports median latency + per-shot
throughput for each:

    python benchmarks/serve_latency.py [--d 11] [--batches 1 16 256 4096]

Chained-dispatch timing per PERF_NOTES.md (the axon tunnel adds ~30 ms of
client-side completion-poll latency per sync, which a pipelined serving
loop never pays); single-sync latency is also reported since a lone
request does pay it on this tunnel (on a directly-attached TPU the two
converge).  Run on an idle host.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--family", default="surface")
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 16, 256, 1024, 4096])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--p", type=float, default=0.03)
    ap.add_argument("--checkpoint", default=None,
                    help="load params from this run dir (default: random init)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig
    from tpugnn.serve import DecodeEngine
    from tpugnn.tanner import build_code
    from tpugnn.utils.hostidle import paused_queue_jobs

    cfg = ExperimentConfig(
        code=CodeConfig(family=args.family, distance=args.d, p=args.p),
        model=ModelConfig(hidden=args.hidden, msg_hidden=args.hidden,
                          rounds=args.rounds, backend="fused",
                          readout="per_qubit", dtype="bfloat16"),
    )
    graph = build_code(args.family, args.d)

    if args.checkpoint:
        from tpugnn.train.checkpoint import CheckpointManager
        from tpugnn.train.loop import init_state

        state, _ = init_state(cfg, graph)
        restored = CheckpointManager(args.checkpoint).restore_latest(state)
        if restored is None:
            print(f"no checkpoint in {args.checkpoint}", file=sys.stderr)
            return 1
        params = restored.params
    else:
        from tpugnn.train.loop import init_state

        state, _ = init_state(cfg, graph)
        params = state.params

    rng = np.random.default_rng(0)
    rows = []
    with paused_queue_jobs() if jax.default_backend() == "tpu" else _noop():
        for b in args.batches:
            try:
                eng = DecodeEngine(cfg, params, graph, max_batch=b)
            except Exception as e:  # one batch size failing must not kill the sweep
                print(json.dumps({"batch": b,
                                  "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                      flush=True)
                continue
            syn = (rng.random((b, graph.n_checks)) < args.p).astype(np.uint8)
            eng.decode(syn)  # warm the numpy path too
            # single-sync latency: one isolated request
            lat = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                eng.decode(syn)
                lat.append(time.perf_counter() - t0)
            # chained: a pipelined stream of requests
            t0 = time.perf_counter()
            for _ in range(args.chain):
                eng.decode(syn)
            chained = (time.perf_counter() - t0) / args.chain
            row = {
                "batch": b,
                "latency_ms": round(statistics.median(lat) * 1e3, 3),
                "pipelined_ms": round(chained * 1e3, 3),
                "shots_per_s": round(b / chained, 1),
                "platform": jax.default_backend(),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return 0


class _noop:
    def __enter__(self):
        return []

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    sys.exit(main())
