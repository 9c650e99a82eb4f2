"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective tests
run against XLA's host platform with 8 virtual devices (SURVEY.md
section 4 'Implication for the rebuild').
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gsc: end-to-end accuracy gate on real Google Speech Commands "
        "(requires GSC_ROOT)",
    )


@pytest.fixture(scope="session", autouse=True)
def _force_cpu():
    """Pin default computation to CPU.

    The axon TPU plugin in this image registers itself regardless of
    JAX_PLATFORMS, so we pin the default device instead; multi-device
    tests build meshes from jax.devices('cpu') explicitly.
    """
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    yield


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices("cpu")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
