"""High-shot classical-baseline LER table (union-find, BP+OSD-0, MWPM).

The GNN side of the parity table evaluates in seconds on the TPU; the
classical baselines are host-side (C++ union-find / OSD) and dominate
wall-clock at 10^6 shots, so this harness runs them separately (CPU, e.g.
overnight) and caches one JSON line per (family, d, p, decoder) in
benchmarks/baseline_ler.jsonl.  benchmarks/ler_table.py results can then be
merged against these instead of re-sampling baselines at low shot counts.

    python benchmarks/baseline_table.py --ds 3 5 7 9 11 --shots 1000000
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
    ap.add_argument("--family", default="surface")
    ap.add_argument("--ds", type=int, nargs="+", default=[3, 5, 7, 9, 11])
    ap.add_argument("--ps", type=float, nargs="+",
                    default=[0.01, 0.02, 0.03, 0.05])
    ap.add_argument("--shots", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--bp-iters", type=int, default=32)
    ap.add_argument("--decoders", nargs="+", default=["uf", "bp_osd", "mwpm"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "baseline_ler.jsonl"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpugnn.eval.baseline import ler_bp_osd, ler_mwpm, ler_union_find
    from tpugnn.tanner import build_code

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["family"], r["d"], r["p"], r["decoder"],
                              r["shots"]))
                except Exception:
                    pass

    with open(args.out, "a") as f:
        for d in args.ds:
            graph = build_code(args.family, d)
            for p in args.ps:
                for dec in args.decoders:
                    key = (args.family, d, p, dec, float(args.shots))
                    if key in done:
                        continue
                    t0 = time.time()
                    if dec == "uf":
                        ev = ler_union_find(
                            graph, p=p, shots=args.shots, batch=args.batch,
                            key=jax.random.PRNGKey(1234))
                    elif dec == "mwpm":
                        ev = ler_mwpm(
                            graph, p=p, shots=args.shots, batch=args.batch,
                            key=jax.random.PRNGKey(1234))
                    else:
                        ev = ler_bp_osd(
                            graph, p=p, shots=args.shots, batch=args.batch,
                            iters=args.bp_iters,
                            key=jax.random.PRNGKey(1234))
                    row = {"family": args.family, "d": d, "p": p,
                           "decoder": dec, "ler": ev["ler"],
                           "ler_stderr": ev["ler_stderr"],
                           "shots": ev["shots"],
                           "wall_s": round(time.time() - t0, 1)}
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
