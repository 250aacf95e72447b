"""Test harness config: force an 8-device CPU platform (SURVEY.md §4.4).

Tests run on CPU with XLA's host-platform device-count flag so distributed
code paths (mesh, shard_map, edge partitioning) are exercised in one process
without TPU hardware.  Pallas kernels run in interpreter mode on CPU (their
test modules pass ``interpret=True``).

Set TPUGNN_TEST_PLATFORM=tpu to run the suite against real devices instead.
"""

import os

if os.environ.get("TPUGNN_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # the axon sitecustomize registers a TPU plugin and pins jax_platforms;
    # override it after import so tests stay on the host CPU platform
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices (CPU host-platform flag not applied)")
    return devs[:8]
