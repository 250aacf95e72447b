"""Structured metrics + profiling hooks (SURVEY.md §5 observability).

The reference prints loss/LER to stdout [SURVEY.md §5]; here metrics are
structured records flowing to stdout and/or JSONL so runs are machine
parseable, plus a ``profile`` context that wraps any region in a
``jax.profiler.trace`` capture for XProf/Perfetto.

Canonical metric names (used by train/eval/bench):
    loss, loss_qubit, loss_logical, acc_qubit, ler, ler_stderr,
    ler_logical, edges_per_s, step_time_ms, collective_fraction
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import IO, Iterator, Optional

__all__ = ["MetricLogger", "profile", "Timer"]


class MetricLogger:
    """Write metric records to stdout and/or a JSONL file."""

    def __init__(self, jsonl_path: Optional[str] = None, *, stdout: bool = True,
                 prefix: str = ""):
        self._stdout = stdout
        self._prefix = prefix
        self._fh: Optional[IO[str]] = None
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)), exist_ok=True)
            self._fh = open(jsonl_path, "a", buffering=1)

    def log(self, record: dict) -> None:
        rec = {k: (float(v) if hasattr(v, "item") else v) for k, v in record.items()}
        rec.setdefault("time", time.time())
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        if self._stdout:
            step = rec.get("step")
            body = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k not in ("time", "step")
            )
            head = f"{self._prefix}step {step}: " if step is not None else self._prefix
            print(head + body)

    def __call__(self, *args) -> None:
        """Accept ``log(dict)`` or legacy ``log(str)`` calls."""
        if len(args) == 1 and isinstance(args[0], dict):
            self.log(args[0])
        else:
            print(self._prefix + " ".join(str(a) for a in args))

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def profile(trace_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when ``trace_dir`` is set."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class Timer:
    """Wall-clock timer that fences device work (block_until_ready)."""

    def __init__(self):
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    @staticmethod
    def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
        import statistics

        import jax

        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)
