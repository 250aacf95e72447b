"""Check the d=11 MWPM-parity criterion against the LER table rows.

VERDICT r1 item 1 (the north-star quality clause): the GNN decoder must
match or beat exact MWPM at d=11 for p in {0.02, 0.03, 0.05} within 2
binomial standard errors at 1M shots.  This reads the rows cache written
by benchmarks/ler_table.py and reports, per (d, p), the best GNN-side
column vs MWPM, with the comparison stderr.

    python benchmarks/check_parity.py [--rows benchmarks/LER_TABLE.md.rows.jsonl]
        [--d 11] [--ps 0.02 0.03 0.05]

Exit code 0 iff every requested point passes.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

GNN_COLS = ("gnn_hybrid", "gnn_uf", "gnn_mwpm", "gnn_best_of", "gnn_logical")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "LER_TABLE.md.rows.jsonl"))
    ap.add_argument("--family", default="surface")
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--ps", type=float, nargs="+", default=[0.02, 0.03, 0.05])
    ap.add_argument("--col", default="gnn_best_of",
                    help="GNN column to compare (fixed up front to avoid "
                         "selection bias [ADVICE r2 item 3]); 'best' takes "
                         "the min across all GNN columns (exploratory only)")
    args = ap.parse_args()

    latest: dict = {}
    with open(args.rows) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get("family") != args.family or r.get("d") != args.d:
                continue
            k = (r["p"], r.get("ckpt"))
            latest[k] = r  # last line wins: newest evaluation of that ckpt

    ok = True
    for p in args.ps:
        rows = [r for (pp, _), r in latest.items() if pp == p]
        if not rows:
            print(f"d={args.d} p={p}: NO ROW")
            ok = False
            continue
        # a row without a shot count cannot yield a stderr — treat it as a
        # failure instead of defaulting to 1 shot (which would auto-PASS
        # the point) [ADVICE r2 item 3]
        rows_ok = [r for r in rows if r.get("shots")]
        if not rows_ok:
            print(f"d={args.d} p={p}: rows missing 'shots'")
            ok = False
            continue
        # comparison row fixed up front: the highest-shot evaluation at
        # this p (newest on ties) — not a post-hoc min over checkpoints
        best_row = max(enumerate(rows_ok),
                       key=lambda ir: (ir[1]["shots"], ir[0]))[1]
        if args.col == "best":
            best_name, best_ler = None, None
            for c in GNN_COLS:
                v = best_row.get(c)
                if v is not None and (best_ler is None or v < best_ler):
                    best_name, best_ler = c, v
        else:
            best_name, best_ler = args.col, best_row.get(args.col)
        if best_ler is None:
            print(f"d={args.d} p={p}: no {args.col} column")
            ok = False
            continue
        mwpm = best_row.get("mwpm")
        shots = best_row["shots"]
        if mwpm is None:
            print(f"d={args.d} p={p}: no MWPM column")
            ok = False
            continue
        se = math.sqrt((best_ler * (1 - best_ler) + mwpm * (1 - mwpm))
                       / max(shots, 1))
        margin = best_ler - mwpm
        passed = margin <= 2 * se
        ok &= passed
        rel = (mwpm / best_ler) if best_ler > 0 else float("inf")
        ck = best_row.get("ckpt", "?")
        print(f"d={args.d} p={p}: {best_name}={best_ler:.3g} vs "
              f"mwpm={mwpm:.3g} ({rel:.2f}x) margin={margin:+.2g} "
              f"2se={2 * se:.2g} [ckpt={ck} shots={shots:g}] "
              f"-> {'PASS' if passed else 'FAIL'}")
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
