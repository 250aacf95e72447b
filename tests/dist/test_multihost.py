"""Two-process jax.distributed smoke test (SURVEY.md §4.4 multi-host CI).

Launches two CPU processes that initialize the distributed runtime via
tpugnn.dist.multihost, build the global mesh, and run a cross-process psum
plus full sharded train steps (d=5 and the d=15 configs[4] stand-in).

Skip policy [VERDICT r1 item 10]: ONLY a genuine environment-setup failure
skips — the runtime timing out or dying BEFORE ``multihost.initialize()``
completed (workers print ``INIT OK`` after it).  Any failure after INIT OK,
and any numeric mismatch from a completed run, FAILS the test: a broken
distributed runtime must not read as green.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {root!r})
    from tpugnn.dist import multihost
    multihost.initialize()
    print("INIT OK", flush=True)
    import jax.numpy as jnp
    info = multihost.process_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info
    # cross-process reduction over all devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    mesh = Mesh(np.array(jax.devices()).reshape(4), ("d",))
    x = jnp.ones((8,), jnp.float32)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    y = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), np.ones((8,), np.float32), (8,)
    )
    print("RESULT", float(total(y)))
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _communicate_or_skip(procs, *, timeout):
    """Collect worker outputs; a hang is only a skip if no worker got past
    initialize() (a post-init hang means the runtime broke mid-run: fail)."""
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out.decode(), err.decode()))
    except subprocess.TimeoutExpired:
        partial = []
        for p in procs:
            p.kill()
            out, err = p.communicate()
            partial.append((out.decode(), err.decode()))
        if any("INIT OK" in out for out, _ in partial):
            raise AssertionError(
                f"distributed run hung AFTER initialize(): {partial!r}"
            ) from None
        pytest.skip("distributed runtime never initialized in this environment")
    return outs


def _gate_env_failure(rc, out, err):
    """Fail on any post-init error; skip only pre-init environmental ones."""
    if rc == 0:
        return
    pre_init = "INIT OK" not in out
    env_markers = ("UNAVAILABLE" in err or "DEADLINE" in err
                   or "bind" in err.lower())
    if pre_init and env_markers:
        pytest.skip(f"environmental distributed failure: {err[-200:]}")
    raise AssertionError(f"worker failed rc={rc}:\n{err[-2000:]}")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    port = _free_port()
    worker = _WORKER.format(root=root)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORD=f"127.0.0.1:{port}",
            JAX_NUM_PROC="2",
            JAX_PROC_ID=str(pid),
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin out
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    outs = _communicate_or_skip(procs, timeout=180)
    for rc, out, err in outs:
        _gate_env_failure(rc, out, err)
        assert "RESULT 8.0" in out, out


_WORKER_DRYRUN = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {root!r})
    from tpugnn.dist import multihost
    multihost.initialize()
    print("INIT OK", flush=True)
    assert jax.process_count() == 2 and len(jax.devices()) == 4
    from tpugnn.dist.api import dryrun
    dryrun(4, distance={distance})  # graph axis spans the processes
    print("MULTIHOST DRYRUN OK")
    """
)


@pytest.mark.slow
@pytest.mark.parametrize("distance", [5, 15])
def test_two_process_sharded_train_step(tmp_path, distance):
    """Full edge-partitioned train step across two jax.distributed processes.

    The ('data', 'graph') mesh spans both processes, so the halo all_to_all
    crosses the process boundary; both workers must print the dryrun's
    deterministic loss.  d=15 is the BASELINE configs[4] multi-host
    stand-in exercised cross-process.
    """
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    port = _free_port()
    worker = _WORKER_DRYRUN.format(root=root, distance=distance)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORD=f"127.0.0.1:{port}",
            JAX_NUM_PROC="2",
            JAX_PROC_ID=str(pid),
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    outs = _communicate_or_skip(procs, timeout=540)
    losses = []
    for rc, out, err in outs:
        _gate_env_failure(rc, out, err)
        assert "MULTIHOST DRYRUN OK" in out, out
        losses.append([ln for ln in out.splitlines() if "loss=" in ln][-1])
    assert losses[0] == losses[1], losses
