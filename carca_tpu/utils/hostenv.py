"""Dev-box helpers for running on N *virtual* CPU devices.

The dev box's TPU relay plugin overrides JAX_PLATFORMS at interpreter
start, so a virtual-CPU mesh needs a subprocess with the plugin's trigger
env scrubbed. One helper, shared by the driver entry point, the scaling
harness, and the test conftest — these had drifted as three copies.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def virtual_cpu_env(n_devices: int,
                    base: Optional[Dict[str, str]] = None) -> Dict[str, str]:
    """A subprocess env that exposes ``n_devices`` virtual CPU devices."""
    env = dict(os.environ if base is None else base)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # dev-box TPU relay plugin trigger
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def enable_compilation_cache(path: str) -> None:
    """Persistent XLA compilation cache: compiled executables are keyed by
    HLO and reused across processes, removing the multi-minute cold-start
    compile from serving restarts and repeated training runs (first compile
    of the flagship jnp-attention path is ~4 min on this relay). No-op on
    an empty path."""
    if not path:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: restart latency is dominated by the many
    # small executables around the hot step, not just the big one
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
