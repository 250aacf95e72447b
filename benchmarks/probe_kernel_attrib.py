"""Probe: attribute the fused kernel's step time to its op classes.

PERF_NOTES.md leaves the flagship kernel at ~42.5 ms against a ~13 ms
all-GEMM floor and names the VPU elementwise mix as the suspected limiter.
This probe times the kernel with measurement-only ablations (see
kernels/fused_decoder._make_kernel) so the gap can be attributed instead of
guessed:

  base        — production kernel
  sumrelu     — EXACT slot-reduction rewrite (max(z,-y)+y, hoisted adds);
                if faster, this becomes the production default
  noslotrelu  — slot GEMMs kept, per-slot relu/add passes dropped
  oneslot     — one gather slot per direction (D -> 1)
  noln        — LayerNorm statistics dropped (affine only)
  noupdate    — update-MLP hidden GEMM + relu dropped

Chained-dispatch timing (PERF_NOTES.md tunnel amortization).  Run on an
idle host.

    python benchmarks/probe_kernel_attrib.py [--variants base sumrelu ...]
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
    ap.add_argument("--variants", nargs="+",
                    default=["base", "sumrelu", "fold", "interleave",
                             "sumrelu+fold+interleave",
                             "sumrelu+fold+interleave+ln1pass",
                             "sumrelu+fold+interleave+biasfold",
                             "sumrelu+fold+interleave+ln1pass+biasfold",
                             "noslotrelu", "oneslot", "noln", "noupdate"],
                    help="'+'-joined keys combine ablations in one kernel")
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--tb", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    from tpugnn.kernels.fused_decoder import (
        RoundWeights, decoder_rounds, make_operators,
    )
    from tpugnn.tanner import build_code

    g = build_code("surface", args.d)
    h = mh = args.hidden
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 32))

    def w(*shape):
        return 0.1 * jax.random.normal(next(keys), shape, dtype=jnp.float32)

    weights = RoundWeights(
        wd_c=w(h, mh), ws_c=w(h, mh), b0_c=w(1, mh), wo_c=w(mh, h),
        bo_c=w(1, h),
        wd_q=w(h, mh), ws_q=w(h, mh), b0_q=w(1, mh), wo_q=w(mh, h),
        bo_q=w(1, h),
        uc_x=w(h, h), uc_a=w(h, h), uc_s=w(1, h), uc_b0=w(1, h),
        uc_w1=w(h, h), uc_b1=w(1, h),
        uq_x=w(h, h), uq_a=w(h, h), uq_b0=w(1, h), uq_w1=w(h, h),
        uq_b1=w(1, h),
        lnc_scale=1.0 + w(1, h), lnc_bias=w(1, h),
        lnq_scale=1.0 + w(1, h), lnq_bias=w(1, h),
    )
    ops = make_operators(g)
    xc = w(args.batch, g.n_checks_pad, h)
    xq = w(args.batch, g.n_qubits_pad, h)
    syn = (jax.random.uniform(next(keys), (args.batch, g.n_checks_pad, 1))
           < 0.1).astype(jnp.float32)
    edges = args.batch * g.n_edges * args.rounds

    results = {}
    for name in args.variants:
        ablate = () if name == "base" else tuple(name.split("+"))
        try:
            t0 = time.perf_counter()
            out = decoder_rounds(
                xc, xq, syn, ops, weights, rounds=args.rounds,
                block_batch=args.tb, compute_dtype=args.dtype, ablate=ablate,
            )
            hard_sync(out)
            compile_s = time.perf_counter() - t0
            # idle-host timing: pause queue-advertised background jobs for
            # the measured region (PERF_NOTES timing policy)
            from contextlib import nullcontext

            from tpugnn.utils.hostidle import paused_queue_jobs

            pause = (paused_queue_jobs() if jax.default_backend() == "tpu"
                     else nullcontext([]))
            with pause:
                ts = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    for _ in range(args.chain):
                        out = decoder_rounds(
                            xc, xq, syn, ops, weights, rounds=args.rounds,
                            block_batch=args.tb, compute_dtype=args.dtype,
                            ablate=ablate,
                        )
                    hard_sync(out)
                    ts.append((time.perf_counter() - t0) / args.chain)
            t = statistics.median(ts)
            results[name] = t
            print(json.dumps({
                "variant": name, "step_ms": round(t * 1e3, 2),
                "medges_per_s": round(edges / t / 1e6, 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "variant": name,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }), flush=True)
    if "base" in results:
        base = results["base"]
        deltas = {k: round((base - v) * 1e3, 2) for k, v in results.items()
                  if k != "base"}
        print(json.dumps({"saved_ms_vs_base": deltas}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
