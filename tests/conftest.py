"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the analog of the reference's
CPU-container fake backend, SURVEY.md §4) so tensor/mesh/collective logic is
exercised without TPU hardware. Must run before the first `import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin in this environment overrides JAX_PLATFORMS at import
# time; the config update after import reliably pins tests to the CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    return devices
