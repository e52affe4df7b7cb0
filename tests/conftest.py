"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 fake devices so multi-chip sharding paths
(dp x tp meshes, psum collectives) are exercised without TPU hardware, and
so numerics are f32-exact (TPU matmuls default to bf16 inputs).

The environment's sitecustomize registers a TPU PJRT plugin at interpreter
start, so plain env vars in conftest are too late; instead we flip
``jax_platforms`` through the config API before any backend initializes
(plugin registration is lazy — the first ``jax.devices()`` call wins).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "integration: full-pipeline CLI tests (slower)")
