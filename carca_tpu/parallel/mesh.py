"""Device mesh construction and sharding rules.

The framework uses one global mesh with a ``data`` axis (batch / DP) and an
optional ``model`` axis (row-sharded embedding tables). All sharding is
expressed as ``NamedSharding`` over this mesh; XLA SPMD inserts the
collectives (gradient ``psum`` over ``data``, lookup ``psum`` over
``model``) on ICI. There is no hand-written transport layer — that is the
TPU-native replacement for the NCCL/MPI stacks the reference lacks
(SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kw) -> None:
    """Multi-host init (no-op when single-process). Call once before any
    JAX computation on a pod slice; coordinator/process env comes from the
    TPU runtime.

    Only the benign cases are swallowed (already initialized; no
    coordinator configured = single process). A genuine multi-host init
    failure must raise — otherwise every host silently trains the full
    workload independently and races on the checkpoint directory."""
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            return  # initialized earlier — benign
        if "before any jax calls" in msg:
            # the backend is already up (e.g. a PJRT plugin initialized it
            # at import) — on a real pod each process must call this before
            # touching JAX, but a single-process run is fine to continue
            import sys
            sys.stderr.write(
                "initialize_distributed: XLA backend already initialized; "
                "continuing single-process (on a pod, call this before any "
                "JAX usage)\n")
            return
        raise
    except ValueError:
        pass  # no coordinator/process env → single-process run


def make_mesh(
    shape: Tuple[int, ...] = (),
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global mesh. ``shape=()`` → all devices on the first axis.

    ``mesh_utils.create_device_mesh`` lays logical axes onto the physical
    ICI topology so the innermost axis gets the fastest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    try:
        dmesh = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):  # virtual/CPU devices: plain reshape
        dmesh = np.asarray(devices).reshape(shape)
    return Mesh(dmesh, axes)


def _is_table_path(path) -> bool:
    """A leaf is a shardable table iff its pytree path goes through the
    embedding's ``items`` table (mirrored inside optimizer state by optax)."""
    for p in path:
        if getattr(p, "key", None) == "items":
            return True
    return False


def param_shardings(tree, mesh: Mesh, shard_embeddings: bool = False):
    """Sharding pytree for params / TrainState / optimizer state.

    Embedding tables (and their Adam moments, which share the tree path) are
    row-sharded ``P('model', None)`` when requested; everything else is
    replicated. Works on concrete pytrees and on ``jax.eval_shape`` output.
    """
    has_model = shard_embeddings and "model" in mesh.axis_names

    def rule(path, leaf):
        if has_model and _is_table_path(path) and getattr(leaf, "ndim", 0) == 2:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, tree)


def batch_shardings(batch, mesh: Mesh):
    """Shard every batch array over ``data`` on its leading dim."""
    def rule(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))
    return jax.tree_util.tree_map(rule, batch)


def table_sharding(mesh: Mesh, shard_embeddings: bool = False) -> NamedSharding:
    if shard_embeddings and "model" in mesh.axis_names:
        return NamedSharding(mesh, P("model", None))
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch with data-parallel shardings (fixed shapes →
    one transfer per array, no per-device slicing on the host)."""
    return jax.device_put(batch, batch_shardings(batch, mesh))


def put_if_multiprocess(tree, shardings):
    """Global-ize host/local arrays before a jit with non-trivial
    ``in_shardings`` — on a multi-host pod, jit REJECTS raw numpy /
    process-local arrays for sharded specs ("Passing non-trivial shardings
    for numpy inputs is not allowed"); ``device_put`` builds the global
    array from the (identical-per-process) host value. Single-process runs
    skip it: jit's own implicit transfer is equivalent and this avoids a
    second dispatch on the hot path."""
    if jax.process_count() == 1:
        return tree
    return jax.device_put(tree, shardings)


def prepare_state_for_mesh(state, mesh: Mesh, tx, sparse_items: bool = False):
    """Pad embedding tables to row-shard evenly over ``model`` and rebuild
    the optimizer state to match (split dense/sparse structure when the
    lazy item-table Adam is on). Call once before training starts (resume
    checkpoints then carry padded shapes already)."""
    if mesh.shape.get("model", 1) == 1:
        return state

    def pad(path, leaf):
        if _is_table_path(path) and getattr(leaf, "ndim", 0) == 2:
            return jax.numpy.asarray(pad_table_rows(leaf, mesh))
        return leaf

    params = jax.tree_util.tree_map_with_path(pad, state.params)
    if sparse_items:
        from carca_tpu.train import sparse_adam as sa
        opt_state = {"dense": tx.init(sa.without_items(params)),
                     "items": sa.init_state(params["embed"]["items"])}
    else:
        opt_state = tx.init(params)
    return state.replace(params=params, opt_state=opt_state)


def pad_table_rows(table, mesh: Mesh):
    """Pad a table's row count to a multiple of the ``model`` axis size so it
    row-shards evenly; pad rows are never indexed (ids < n_items). Works on
    numpy and device (jnp) tables — device tables stay on device."""
    n = mesh.shape.get("model", 1)
    rows = table.shape[0]
    pad = (-rows) % n
    if pad:
        xp = np if isinstance(table, np.ndarray) else jax.numpy
        table = xp.concatenate(
            [table, xp.zeros((pad,) + table.shape[1:], table.dtype)], axis=0)
    return table
