"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Mirrors the test strategy designed in SURVEY.md §4 (the reference ships no
tests): CPU backend doubles as the fake backend, and
``xla_force_host_platform_device_count=8`` simulates an 8-chip mesh so
sharding/pjit paths are exercised without TPUs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The concurrency-optimized thunk schedule lets XLA:CPU run independent
# collectives in different orders on different virtual devices; with a dp x
# tp mesh (tensor-parallel psums + data-axis all-to-alls in flight at once)
# the blocking in-process rendezvous then deadlock-aborts (~2/3 of runs).
# A sequential schedule per device makes every device hit collectives in
# the same order.  TPU runs don't use this code path at all.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
)

import jax  # noqa: E402

# The environment may pre-set jax_platforms to prefer an attached TPU; tests
# must run on the virtual 8-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
