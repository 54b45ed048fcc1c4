"""Test configuration: run all tests on a virtual 8-device CPU mesh with
float64 enabled, so parity checks against the float64 reference oracle are
exact and multi-chip sharding is exercised without TPU hardware
(SURVEY.md §4: fake-mesh CPU tests)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
