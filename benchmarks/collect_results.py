"""Aggregate all benchmark/quality artifacts into docs/RESULTS.md.

Idempotent: reads whatever exists under runs/ and benchmarks/ and rewrites
the summary; rerun after any queue drain.

    python benchmarks/collect_results.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _jsonl(path):
    """Rows from a JSONL file, or a 1-row list for a whole-file JSON doc
    (bench_latest.json is pretty-printed)."""
    rows = []
    try:
        with open(os.path.join(ROOT, path)) as f:
            text = f.read()
    except OSError:
        return rows
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except Exception:
                pass
    if not rows:
        try:
            doc = json.loads(text)
            if isinstance(doc, dict):
                rows = [doc]
        except Exception:
            pass
    return rows


def main() -> int:
    out = ["# Results (auto-collected)\n",
           "Regenerate with `python benchmarks/collect_results.py` after "
           "a queue drain.\n"]

    # newest REAL-HARDWARE bench artifact wins (bench.py self-persists
    # bench_latest.json for TPU runs; CPU smokes never qualify)
    bench_paths = ["benchmarks/bench_latest.json", "runs/bench_r2.json",
                   "runs/bench_prod_variants.json"]
    bench_paths = [p for p in bench_paths
                   if os.path.exists(os.path.join(ROOT, p))]
    bench_paths.sort(key=lambda p: os.path.getmtime(os.path.join(ROOT, p)),
                     reverse=True)
    b = None
    for p in bench_paths:
        rows = [r for r in _jsonl(p) if r.get("platform") == "tpu"
                and "value" in r]
        if rows:
            b = rows[-1]
            break
    if b:
        out.append("## Headline decode throughput (bench.py)\n")
        out.append("```json\n" + json.dumps(b, indent=1) + "\n```\n")

    out.append("## Logical error rate\n")
    out.append("See `benchmarks/LER_TABLE.md` (1M-shot Monte-Carlo, GNN vs "
               "union-find vs BP+OSD-0 vs exact MWPM, plus the GNN+UF / "
               "GNN+MWPM residual-cleanup hybrids).\n")
    for extra, title in (("benchmarks/LER_TORIC.md", "toric-code table"),
                         ("benchmarks/LER_D11_P001.md",
                          "d=11 p=0.01 high-shot resolution"),
                         ("benchmarks/LER_DETECTOR.md",
                          "circuit-level + spacetime detector graphs")):
        if os.path.exists(os.path.join(ROOT, extra)):
            out.append(f"Also: `{extra}` ({title}).\n")

    tp = _jsonl("runs/decoder_throughput_r3c.json") \
        or _jsonl("runs/decoder_throughput_r3.json") \
        or _jsonl("runs/decoder_throughput.json")
    if tp:
        out.append("## Decoder throughput comparison\n")
        out.append("| decoder | shots/s | batch |\n|---|---|---|\n")
        for r in tp:
            if "shots_per_s" in r:
                out.append(f"| {r['decoder']} | {r['shots_per_s']:.0f} | "
                           f"{r['batch']} |\n")
        out.append("\n")

    ici = _jsonl("runs/ici_projection.json")
    if ici:
        out.append("## Multi-chip scaling projection (docs/SCALING.md)\n")
        rows_i = ici[-1].get("rows", [])
        out.append("| d | mesh (data,graph) | compute ms | ICI ms (1 link) "
                   "| eff. overlap 1link | 2link |\n|---|---|---|---|---|---|\n")
        for r in rows_i:
            out.append(f"| {r['d']} | {tuple(r['mesh'])} | {r['compute_ms']} "
                       f"| {r['ici_ms_1link']} | {r['eff_overlap_1link']} | "
                       f"{r['eff_overlap_2link']} |\n")
        dp = ici[-1].get("dataparallel_hlo", {})
        out.append(f"\nData-parallel decode scheduled-HLO collective count: "
                   f"{dp}\n\n")

    sl = _jsonl("runs/serve_latency_r3.json") \
        or _jsonl("runs/serve_latency_d11.json")
    if sl:
        out.append("## Serving latency (d=11)\n")
        out.append("| batch | latency ms | pipelined ms | shots/s |\n"
                   "|---|---|---|---|\n")
        for r in sl:
            if "latency_ms" in r:
                out.append(f"| {r['batch']} | {r['latency_ms']} | "
                           f"{r['pipelined_ms']} | {r['shots_per_s']:.0f} |\n")
        out.append("\n")

    pa = _jsonl("runs/probe_attrib_r1e.json")
    if pa:
        out.append("## Kernel schedule attribution (d=11 hardware probe)\n")
        out.append("| variant | step ms | M edges/s |\n|---|---|---|\n")
        for r in pa:
            if "step_ms" in r:
                out.append(f"| {r['variant']} | {r['step_ms']} | "
                           f"{r['medges_per_s']} |\n")
        out.append("\n")

    for path, title in (("runs/probe_ablate_r3.json",
                         "Kernel ablation attribution (d=11, round 3, "
                         "idle-host)"),
                        ("runs/probe_ablate_r2.json",
                         "Kernel ablation attribution (d=11, round 2)")):
        pa2 = _jsonl(path)
        if pa2:
            out.append(f"## {title}\n")
            out.append("| variant | step ms | M edges/s |\n|---|---|---|\n")
            for r in pa2:
                if "step_ms" in r:
                    out.append(f"| {r['variant']} | {r['step_ms']} | "
                               f"{r['medges_per_s']} |\n")
            out.append("\n")

    roll = _jsonl("runs/probe_roll_r3.json") + _jsonl("runs/probe_roll16_r3.json")
    if roll:
        out.append("## Gather-representation sweep (roll-gather kernel, "
                   "round 3)\n")
        out.append("One-hot GEMM vs cyclic-roll slot gathers "
                   "(kernels/roll_gather.py; PERF_NOTES round 3 for the "
                   "floor analysis):\n")
        out.append("```json\n" + "\n".join(json.dumps(r) for r in roll)
                   + "\n```\n")

    pt = _jsonl("runs/probe_train_step.json")
    if pt:
        out.append("## Training-step backends (d=11)\n")
        out.append("```json\n" + "\n".join(json.dumps(r) for r in pt) + "\n```\n")
    for path, title in (("runs/probe_train_r8_r3.json",
                         "Training step, R=8 kernel backward (idle-host, "
                         "old TB=8 tile)"),
                        ("runs/probe_train_r8_tb16.json",
                         "Training step, R=8 kernel backward (TB=16 @ "
                         "112 MB — production default)"),
                        ("runs/probe_train_r14_r3.json",
                         "Training step, R=14 kernel backward (idle-host, "
                         "old TB=4 tile)"),
                        ("runs/probe_train_r14_tb8.json",
                         "Training step, R=14 kernel backward (TB=8 @ "
                         "112 MB — production default, 1.77x)")):
        pr = _jsonl(path)
        if pr:
            out.append(f"## {title}\n")
            out.append("```json\n" + "\n".join(json.dumps(r) for r in pr)
                       + "\n```\n")

    nw = _jsonl("runs/probe_narrow_h96.json")
    if nw:
        out.append("## Narrow-width (H=96, padded) kernel hardware check\n")
        out.append("```json\n" + "\n".join(json.dumps(r) for r in nw) + "\n```\n")

    sq = _jsonl("runs/stream_quality.json")
    if sq:
        out.append("## Streaming decode quality (GNN windows vs union-find)\n")
        out.append("| family | d | W/C | T | p | GNN stream | GNN+UF stream "
                   "| UF stream | UF monolithic |\n"
                   "|---|---|---|---|---|---|---|---|---|\n")
        for r in sq:
            if "gnn_stream" in r:
                gc = r.get("gnn_uf_stream")
                out.append(
                    f"| {r['family']} | {r['d']} | {r['window']}/{r['commit']} "
                    f"| {r['total_rounds']} | {r['p']} | {r['gnn_stream']:.4g} "
                    f"| {'—' if gc is None else f'{gc:.4g}'} "
                    f"| {r['uf_stream']:.4g} | {r['uf_monolithic']:.4g} |\n")
        out.append("\n")

    try:
        with open(os.path.join(ROOT, "runs/d15_dryrun.json")) as f:
            d15 = json.load(f)
    except (OSError, ValueError):
        d15 = None
    if d15:
        out.append("## d=15+ scale demonstration (configs[4] stand-in)\n")
        out.append("Sharded train step on an 8-virtual-device CPU mesh "
                   "(`benchmarks/d15_sizing.py`):\n")
        for r in d15.get("runs", []):
            out.append(f"- d={r['distance']} halo={r['halo']}: ok "
                       f"({r['wall_s']}s, mesh {r['mesh']})\n")
        out.append("\nHBM budget (flagship B=4096, H=128, R=14, 16 GiB v5e):\n")
        out.append("| d | rows | decode GiB | train GiB | fits |\n"
                   "|---|---|---|---|---|\n")
        for r in d15.get("hbm_budget", []):
            out.append(f"| {r['d']} | {r['rows_padded']} | "
                       f"{r['decode_hbm_gib']} | {r['train_total_hbm_gib']} | "
                       f"{'yes' if r['fits_16gib_train'] else 'decode only'} |\n")
        out.append("\n")

    if os.path.exists(os.path.join(ROOT, "docs", "OVERLAP.md")):
        out.append("## Collective/compute overlap\n")
        out.append("Scheduled-HLO verification of halo-exchange overlap on "
                   "an abstract v5e-8 topology: `docs/OVERLAP.md`.\n")

    # quality-run finals from the training logs
    finals = [r for r in _jsonl("runs/train_quality_v3.log") if "final" in r]
    if finals:
        out.append("## Flagship training finals (surface, p=0.05 in-train eval)\n")
        out.append("| d | steps | wall s | hybrid LER | EMA hybrid |\n"
                   "|---|---|---|---|---|\n")
        for r in finals:
            f = r["final"]
            hy = f.get("ler_hybrid")
            em = f.get("ler_hybrid_ema")
            out.append(f"| {r['d']} | {r['steps']} | {r['wall_s']} | "
                       f"{'-' if hy is None else f'{hy:.4g}'} | "
                       f"{'-' if em is None else f'{em:.4g}'} |\n")
        out.append("\n")

    path = os.path.join(ROOT, "docs", "RESULTS.md")
    with open(path, "w") as f:
        f.write("\n".join(x.rstrip("\n") for x in out) + "\n")
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
