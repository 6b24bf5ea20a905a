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
# XLA:CPU guards every in-process collective with a watchdog that
# LOG(FATAL)s (SIGABRT, rc=-6) when a call looks stuck — default ~30 s.
# On this 1-core-visible sandbox a cold-compiling 8-virtual-device
# training step can legitimately hold a collective open longer than that
# while compile/compute threads contend, which killed
# test_tp_training_step_matches_dp's isolated children 3/3 under
# full-suite load (VERDICT r3 weak #1).  Raise the watchdog far above any
# legitimate stall; a true deadlock is still bounded by the isolated()
# child's own 1800 s subprocess timeout.  TPU runs never see these flags.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1500"
)

import jax  # noqa: E402

# The environment may pre-set jax_platforms to prefer an attached TPU; tests
# must run on the virtual 8-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
