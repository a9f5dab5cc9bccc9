"""Device synchronization that actually synchronizes.

On the axon-tunneled TPU platform, ``jax.block_until_ready`` returns
without draining the execution queue — dispatches under the queue depth
appear to take ~0.1 ms regardless of their real cost, and only a
device→host *value fetch* forces completion (measured: a 1.1 TFLOP matmul
"completed" in 0.2 ms by block_until_ready; fetching one scalar of the
result took the true ~30 ms, after a 3-minute queue drain). Execution is
in-order, so fetching one scalar from the **last** result of a loop drains
everything before it.

All timing/throughput code in this repo must use :func:`sync` instead of
``jax.block_until_ready``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree) -> None:
    """Force completion of every computation ordered before ``tree``.

    Execution is in-order and all outputs of one executable materialize
    together, so one scalar fetch from any array leaf of the last result
    drains the whole queue."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
            return


def fetch_scalar(x) -> float:
    """float(x[0…]) — a minimal true round-trip."""
    flat = jnp.ravel(x)
    return float(flat[0])
