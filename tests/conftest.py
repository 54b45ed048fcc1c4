"""Test configuration: run all tests on a virtual 8-device CPU mesh with
float64 enabled, so parity checks against the float64 reference oracle are
exact and multi-chip sharding is exercised without TPU hardware
(SURVEY.md §4: fake-mesh CPU tests).

Note: the environment's sitecustomize pre-imports jax and registers a TPU
("axon") backend with JAX_PLATFORMS=axon, so env vars are already baked by
the time this file runs. jax.config.update still works because no backend
has been *initialized* yet — it must stay that way until pytest starts.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import pytest

_tests_since_clear = 0


@pytest.fixture(autouse=True)
def _bound_live_xla_programs():
    """The XLA:CPU runtime SIGABRTs after too many live compiled programs
    accumulate in one process (upstream; observed as xdist worker crashes
    once the suite grew past ~90 tests/worker). Dropping the jit caches
    every few dozen tests keeps each worker far below the threshold at a
    small recompile cost."""
    global _tests_since_clear
    yield
    _tests_since_clear += 1
    if _tests_since_clear >= 20:
        _tests_since_clear = 0
        jax.clear_caches()
