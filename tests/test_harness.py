"""Benchmark/scaling harnesses run end-to-end (SURVEY.md §4.6)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8",
           PYTHONPATH=ROOT)


@pytest.mark.slow
def test_scaling_harness_smoke():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "scaling.py"),
         "--cpu", "--d", "3", "--batch", "32", "--rounds", "2",
         "--hidden", "16", "--sizes", "1", "2", "4"],
        env=ENV, capture_output=True, text=True, timeout=600, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "scaling_efficiency"
    assert [r["devices"] for r in rec["runs"]] == [1, 2, 4]
    for r in rec["runs"]:
        assert r["edges_per_s"] > 0


@pytest.mark.slow
def test_bench_quick_smoke():
    env = dict(ENV)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--quick", "--cpu"],
        env=env, capture_output=True, text=True, timeout=900, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "edges/s" and rec["value"] > 0
    assert rec["vs_baseline"] > 0
