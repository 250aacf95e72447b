"""tpugnn.utils.hostidle: pause/resume of queue-advertised jobs."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from tpugnn.utils.hostidle import _queue_pids, paused_queue_jobs


def _state(pid: int) -> str:
    with open(f"/proc/{pid}/stat") as f:
        return f.read().split()[2]


def _spawn_fake_queue_job():
    # argv carries an allowlisted marker (the arg is unused by -c) so the
    # cmdline check recognizes it as one of our queue entrypoints
    return subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(120)",
         "train_quality_v3.py"],
    )


def test_pause_and_resume(tmp_path):
    proc = _spawn_fake_queue_job()
    pidfile = tmp_path / "tpu_active.pid"
    pidfile.write_text(f"{proc.pid}\n")
    try:
        time.sleep(0.3)
        with paused_queue_jobs(str(pidfile), settle_s=0.1) as paused:
            assert paused == [proc.pid]
            assert _state(proc.pid) == "T"
        # resumed on exit
        deadline = time.time() + 5
        while _state(proc.pid) == "T" and time.time() < deadline:
            time.sleep(0.05)
        assert _state(proc.pid) != "T"
    finally:
        proc.kill()
        proc.wait()


def test_resume_on_exception(tmp_path):
    proc = _spawn_fake_queue_job()
    pidfile = tmp_path / "tpu_active.pid"
    pidfile.write_text(f"{proc.pid}\n")
    try:
        # wait for the child to exec so its cmdline carries the queue marker
        # (without this the pause can race the spawn on a loaded host)
        time.sleep(0.3)
        try:
            with paused_queue_jobs(str(pidfile), settle_s=0.1):
                assert _state(proc.pid) == "T"
                raise RuntimeError("bench crashed")
        except RuntimeError:
            pass
        deadline = time.time() + 5
        while _state(proc.pid) == "T" and time.time() < deadline:
            time.sleep(0.05)
        assert _state(proc.pid) != "T"
    finally:
        proc.kill()
        proc.wait()


def test_non_allowlisted_pid_ignored(tmp_path):
    # a process whose cmdline doesn't mention our queue entrypoints must
    # never be signalled
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    pidfile = tmp_path / "tpu_active.pid"
    pidfile.write_text(f"{proc.pid}\n# comment\nnot-a-pid\n999999999\n")
    try:
        assert _queue_pids(str(pidfile)) == []
        with paused_queue_jobs(str(pidfile), settle_s=0.0) as paused:
            assert paused == []
            assert _state(proc.pid) != "T"
    finally:
        proc.kill()
        proc.wait()


def test_missing_pidfile_is_noop(tmp_path):
    with paused_queue_jobs(str(tmp_path / "nope.pid"), settle_s=0.0) as paused:
        assert paused == []


def test_own_pid_skipped(tmp_path):
    pidfile = tmp_path / "tpu_active.pid"
    pidfile.write_text(f"{os.getpid()}\n")
    assert _queue_pids(str(pidfile)) == []
