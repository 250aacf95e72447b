"""Committed LER tables can never silently shrink [VERDICT r3 weak-1/next-5].

Round 3 committed an LER_DETECTOR.md holding only 3 of its 12 cached rows
(a queue stage wrote the md from its own evaluation instead of rebuilding
from the rows cache).  This guard asserts, for every committed markdown
table with a rows cache, that each deduped cached (family, d, p) point
appears in the markdown — so a partial rewrite fails the suite instead of
slipping into git.
"""

import os
import re
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "benchmarks")
sys.path.insert(0, BENCH)

TABLES = [p for p in sorted(os.listdir(BENCH))
          if p.endswith(".md") and os.path.exists(
              os.path.join(BENCH, p + ".rows.jsonl"))]


def _md_points(path):
    """(family, d, p) tuples of every data row in a markdown LER table."""
    pts = set()
    with open(path) as f:
        for line in f:
            if not line.startswith("|"):
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) < 3 or cells[0] in ("family", ""):
                continue
            if set(cells[0]) <= {"-", " "}:  # separator row
                continue
            try:
                pts.add((cells[0], int(cells[1]), float(cells[2])))
            except ValueError:
                continue
    return pts


def _table_eval_in_flight() -> bool:
    """True while a queue-advertised ler_table job is live: rows append to
    the caches continuously and the md is only rebuilt at stage end, so
    md-vs-cache staleness is expected (the stage's closing --rebuild and
    the guard both run against the settled cache afterwards)."""
    pidfile = os.path.join(os.path.dirname(BENCH), "runs", "tpu_active.pid")
    try:
        with open(pidfile) as f:
            pids = [int(x) for x in f.read().split() if x.strip().isdigit()]
    except OSError:
        return False
    for pid in pids:
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                if b"ler_table.py" in f.read():
                    return True
        except OSError:
            continue
    return False


@pytest.mark.parametrize("md", TABLES)
def test_md_covers_rows_cache(md):
    from ler_table import dedup_rows

    if _table_eval_in_flight():
        pytest.skip("ler_table queue job in flight; md rebuilds at stage end")

    md_path = os.path.join(BENCH, md)
    rows = dedup_rows(md_path + ".rows.jsonl")
    have = _md_points(md_path)
    want = {(str(r.get("family")), int(r.get("d")), float(r.get("p")))
            for r in rows
            if r.get("family") is not None and r.get("d") is not None
            and r.get("p") is not None}
    missing = want - have
    assert not missing, (
        f"{md} lost {len(missing)} cached points {sorted(missing)[:6]}... — "
        f"run: python benchmarks/ler_table.py --rebuild --runs dummy "
        f"--out benchmarks/{md}")


def test_tables_discovered():
    # the three published tables must be present and guarded
    assert {"LER_TABLE.md", "LER_TORIC.md", "LER_DETECTOR.md"} <= set(TABLES)
