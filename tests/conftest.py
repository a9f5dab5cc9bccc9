"""Test harness platform setup.

Tests must run on the JAX CPU backend with 8 virtual devices so all
sharding/collective code paths (Mesh, pjit, shard_map) are exercised
deterministically without TPU hardware (SURVEY.md §4).

The dev box tunnels a real TPU through an `axon` PJRT plugin that registers
in ``sitecustomize`` at interpreter start and overrides ``JAX_PLATFORMS``
entirely — the only way to get a CPU backend is to restart the interpreter
with the plugin's trigger env (``PALLAS_AXON_POOL_IPS``) scrubbed. We do
that by re-execing pytest from ``pytest_configure`` (after suspending
pytest's fd capture so the child's output reaches the real stdout). Set
``CARCA_TEST_PLATFORM=tpu`` to skip the re-exec and run the suite on real
hardware (kernel parity checks at bench time).
"""

import os
import sys

_WANT_TPU = os.environ.get("CARCA_TEST_PLATFORM", "cpu") in ("tpu", "axon")
_NEEDS_REEXEC = (not _WANT_TPU and bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
                 and not os.environ.get("_CARCA_TEST_REEXEC"))


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_CARCA_TEST_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"]
              + list(config.invocation_params.args),
              env)


if not _NEEDS_REEXEC and not _WANT_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def skip_unless_devices(n: int) -> None:
    """Guard for tests that build an n-device mesh in-process. On the
    default CPU platform the conftest forces 8 virtual devices, so these
    always run; on a real-hardware suite run (``CARCA_TEST_PLATFORM=tpu``,
    one chip here) they skip with a justification instead of failing
    inside ``make_mesh`` — the sharding semantics they check are
    platform-independent and fully covered by the virtual mesh, while the
    hardware run exists to catch Mosaic lowering/precision issues the CPU
    cannot (CLAUDE.md numerical traps)."""
    import pytest
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices, platform has {jax.device_count()} "
                    f"(sharding is validated on the 8-virtual-device CPU "
                    f"mesh)")
