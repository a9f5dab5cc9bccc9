"""Test harness: force the JAX CPU backend with 8 virtual devices so all
sharding/collective code paths (Mesh, pjit, shard_map) are exercised without
TPU hardware (SURVEY.md §4)."""

import os

# Force CPU regardless of the ambient platform (the dev box exposes a real
# TPU via JAX_PLATFORMS=axon; tests must be deterministic and exercise the
# 8-virtual-device mesh). Set CARCA_TEST_PLATFORM=tpu to run the kernel
# parity tests on real hardware instead.
os.environ["JAX_PLATFORMS"] = os.environ.get("CARCA_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
