"""One-command verdict on every published quality claim.

Default (no --d): sweep EVERY (family, d, p) point in all committed rows
caches and assert the claims the README/tables actually make
[VERDICT r3 missing-5 / next-4]:

* ``best_of``  — GNN best-of <= matched classical baseline (exact MWPM)
  within 2 binomial stderr, at every point in every table (code-capacity,
  toric, spacetime, circuit-level, and the d=11 p=0.01 deep-shot table);
* ``matcher_free`` — the README lead claim: GNN+UF (no matching anywhere)
  <= exact MWPM within 2 stderr, at every code-capacity point
  (LER_TABLE + LER_TORIC; detector-graph families are carried by their
  cleanup and are NOT claimed matcher-free — VERDICT r3 weak-3).

Known-open fronts are listed in ``XFAIL`` and reported as ``XFAIL``
instead of silently excluded; an XFAIL that passes prints ``XPASS
(promote)`` as a prompt to remove the entry.  Exit code 0 iff no
non-expected point fails.

Comparison row per point is fixed up front — the highest-shot evaluation
(newest on ties), never a post-hoc min over checkpoints or columns
[ADVICE r2 item 3].

    python benchmarks/check_parity.py                 # the full gate
    python benchmarks/check_parity.py --d 11          # legacy single-table

Legacy mode (--d/--ps) reads one rows cache and checks one distance, as
rounds 1-3 did.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

BENCH = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, BENCH)

GNN_COLS = ("gnn_hybrid", "gnn_uf", "gnn_mwpm", "gnn_best_of", "gnn_logical")

# (rows-cache md, claims applied to every point in it)
TABLES = [
    ("LER_TABLE.md", ("best_of", "matcher_free")),
    ("LER_TORIC.md", ("best_of", "matcher_free")),
    ("LER_DETECTOR.md", ("best_of",)),
    ("LER_D11_P001.md", ("best_of", "matcher_free")),
]

# Known-open fronts [VERDICT r3]: (family, d, p, claim); None = wildcard.
# Reported as XFAIL, never silently excluded; remove entries as they fall.
XFAIL = [
    # circuit-level d=5: the 4k-step h=96 ckpt loses to matched MWPM by ~8%;
    # the r4a flagship retrain (h128/R14/16k/EMA) targets exactly this
    ("surface_d5_circuit_t5_z", 5, None, None),
    # circuit-level d=3: same undertrained treatment, margin +1.4e-3..5e-3
    # outside 2se — surfaced the first time this gate swept every table
    # (round 4); flagship retrain queued (r4b)
    ("surface_d3_circuit_t3_z", 3, None, None),
]


def _is_xfail(family, d, p, claim):
    for f, dd, pp, cc in XFAIL:
        if ((f is None or f == family) and (dd is None or dd == d)
                and (pp is None or pp == p) and (cc is None or cc == claim)):
            return True
    return False


def _two_se(a, b, shots):
    return 2 * math.sqrt((a * (1 - a) + b * (1 - b)) / max(shots, 1))


def _check_point(r, col, claim, *, verbose=True):
    """PASS/FAIL/XFAIL/XPASS/MISSING for one row and one claim column."""
    family, d, p = r.get("family"), r.get("d"), r.get("p")
    gnn, mwpm, shots = r.get(col), r.get("mwpm"), r.get("shots")
    xf = _is_xfail(family, d, p, claim)
    if gnn is None or mwpm is None or not shots:
        status = "XFAIL-MISSING" if xf else "MISSING"
        if verbose:
            print(f"{family} d={d} p={p} [{claim}]: no {col}/mwpm/shots "
                  f"-> {status}")
        return status
    se2 = _two_se(gnn, mwpm, shots)
    margin = gnn - mwpm
    passed = margin <= se2
    status = ("PASS" if passed else "FAIL") if not xf else (
        "XPASS (promote)" if passed else "XFAIL")
    if verbose:
        rel = (mwpm / gnn) if gnn > 0 else float("inf")
        ck = os.path.basename(str(r.get("ckpt") or "?").rstrip("/"))
        extra = " (partial)" if r.get("partial") else ""
        print(f"{family} d={d} p={p} [{claim}]: {col}={gnn:.3g} vs "
              f"mwpm={mwpm:.3g} ({rel:.2f}x) margin={margin:+.2g} "
              f"2se={se2:.2g} [ckpt={ck}@{r.get('step')} "
              f"shots={shots:g}{extra}] -> {status}")
    return status


def full_gate(args) -> int:
    from ler_table import dedup_rows

    col_of = {"best_of": "gnn_best_of", "matcher_free": "gnn_uf"}
    counts = {"PASS": 0, "FAIL": 0, "XFAIL": 0, "XPASS (promote)": 0,
              "MISSING": 0, "XFAIL-MISSING": 0}
    for md, claims in TABLES:
        cache = os.path.join(BENCH, md + ".rows.jsonl")
        if not os.path.exists(cache):
            print(f"{md}: no rows cache — SKIP (nothing published)")
            continue
        rows = dedup_rows(cache)
        # fixed comparison row per (family, d, p): highest shots, newest
        best: dict = {}
        for i, r in enumerate(rows):
            k = (r.get("family"), r.get("d"), r.get("p"))
            if None in k:
                continue
            prev = best.get(k)
            if prev is None or ((r.get("shots") or 0, i)
                                >= (prev[0].get("shots") or 0, prev[1])):
                best[k] = (r, i)
        print(f"-- {md}: {len(best)} points, claims={list(claims)}")
        for k in sorted(best, key=str):
            r, _ = best[k]
            for claim in claims:
                counts[_check_point(r, col_of[claim], claim)] += 1
    bad = counts["FAIL"] + counts["MISSING"]
    print("PARITY:", "PASS" if bad == 0 else "FAIL",
          json.dumps(counts))
    return 0 if bad == 0 else 1


def legacy(args) -> int:
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
        se2 = _two_se(best_ler, mwpm, shots)
        margin = best_ler - mwpm
        passed = margin <= se2
        ok &= passed
        rel = (mwpm / best_ler) if best_ler > 0 else float("inf")
        ck = best_row.get("ckpt", "?")
        print(f"d={args.d} p={p}: {best_name}={best_ler:.3g} vs "
              f"mwpm={mwpm:.3g} ({rel:.2f}x) margin={margin:+.2g} "
              f"2se={se2:.2g} [ckpt={ck} shots={shots:g}] "
              f"-> {'PASS' if passed else 'FAIL'}")
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=os.path.join(
        BENCH, "LER_TABLE.md.rows.jsonl"))
    ap.add_argument("--family", default="surface")
    ap.add_argument("--d", type=int, default=None,
                    help="legacy single-distance mode; omit for the full "
                         "every-table every-claim gate")
    ap.add_argument("--ps", type=float, nargs="+", default=[0.02, 0.03, 0.05])
    ap.add_argument("--col", default="gnn_best_of",
                    help="legacy mode: GNN column to compare (fixed up front "
                         "to avoid selection bias [ADVICE r2 item 3]); "
                         "'best' takes the min across all GNN columns "
                         "(exploratory only)")
    args = ap.parse_args()
    if args.d is None:
        return full_gate(args)
    return legacy(args)


if __name__ == "__main__":
    sys.exit(main())
