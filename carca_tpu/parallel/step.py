"""Sharded (pjit) train / eval steps over the global mesh.

Same math as the single-device steps in ``carca_tpu.train.loop`` — one
function, compiled once, sharded by annotation:

* batch arrays ``P('data', …)`` — DP; XLA all-reduces gradients over ICI;
* params/opt-state replicated, except embedding tables (and their Adam
  moments) ``P('model', None)`` when ``shard_embeddings`` — lookups then go
  through the ``shard_map`` local-gather+psum path;
* optional on-device negative sampling folded into the step so the host
  ships profile windows only.

This module is the "distributed training loop" component the reference
lacks entirely (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from carca_tpu.models.embeddings import _default_lookup
from carca_tpu.parallel.embedding import make_sharded_lookup
from carca_tpu.parallel.mesh import (batch_shardings, param_shardings,
                                     put_if_multiprocess, table_sharding)
from carca_tpu.parallel.sampling import device_sample_negatives, retries_for
from carca_tpu.train.loop import (_sparse_device_update, apply_gradients,
                                  eval_metrics, train_loss)
from carca_tpu.train.state import TrainState


def _lookup_for(mesh: Mesh, shard_embeddings: bool):
    if shard_embeddings and "model" in mesh.axis_names:
        return make_sharded_lookup(mesh)
    return _default_lookup


def _constrain_batch(batch: dict, mesh: Mesh) -> dict:
    """Pin device-assembled batch tensors to ``P('data', …)``.

    The assembled tensors carry no shardings of their own, and XLA's
    propagation pass is free to invent one per use — observed on the 8-dev
    dryrun: the ``y_true`` concat was given a dim-1 sharding, forcing an
    "involuntary full rematerialization" (replicate-then-reshard) of every
    loss intermediate. One explicit constraint per tensor removes the
    ambiguity.
    """
    def pin(x):
        if getattr(x, "ndim", 0) == 0:  # n_valid scalar
            return x
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return {k: pin(v) for k, v in batch.items()}


def make_sharded_train_step(
    mc,
    tx,
    mesh: Mesh,
    *,
    shard_embeddings: bool = False,
    device_negatives: bool = False,
    tc=None,
    logq=None,
) -> Callable:
    """(state, attrs_table, batch) → (state, loss), sharded over ``mesh``.

    With ``device_negatives`` the batch needs no ``o_x`` negative half: the
    step samples ``[B, L]`` negatives on device each call (fresh per step,
    like the reference's fresh-per-epoch draws, src/data.py:239-245).
    """
    lookup = _lookup_for(mesh, shard_embeddings)
    L = mc.seq_len
    from carca_tpu.train.loop import _loss_opts
    lo = _loss_opts(tc, logq)

    def train_step(state: TrainState, attrs_table, batch):
        rng, step_rng, neg_rng = jax.random.split(state.rng, 3)

        if device_negatives:
            # the host ships only the positive half; negatives are drawn
            # here (fresh per step) and inherit the positives' contexts.
            # Reject against profile AND positives — the newest positive
            # (the window's last item) is not in p_x, and a "negative"
            # equal to it would carry labels 1 and 0 in the same example
            visible = jnp.concatenate(
                [batch["p_x"], batch["o_x"][:, :L]], axis=1)
            o_neg = device_sample_negatives(
                neg_rng, visible, mc.n_items, L,
                retries_for(visible.shape[1], mc.n_items))
            o_neg = jnp.where(batch["p_x"] > 0, o_neg, 0)
            o_c_pos = batch["o_c"][:, :L]
            batch = dict(
                batch,
                o_x=jnp.concatenate([batch["o_x"][:, :L], o_neg], axis=1),
                o_c=jnp.concatenate([o_c_pos, o_c_pos], axis=1),
            )
        return apply_gradients(
            tx, state,
            lambda p: train_loss(mc, p, batch, step_rng, attrs_table,
                                 lookup=lookup, **lo), rng)

    return _jit_sharded(train_step, mc, mesh, shard_embeddings, donate=True)


def make_sharded_eval_step(mc, top_k: int, mesh: Mesh, *,
                           shard_embeddings: bool = False) -> Callable:
    """(params, attrs_table, batch) → (hr_sum, ndcg_sum, loss)."""
    lookup = _lookup_for(mesh, shard_embeddings)

    def eval_step(params, attrs_table, batch):
        return eval_metrics(mc, top_k, params, batch, attrs_table,
                            lookup=lookup)

    repl = NamedSharding(mesh, P())

    def wrapped(params, attrs_table, batch):
        batch = put_if_multiprocess(batch, batch_shardings(batch, mesh))
        return jax.jit(
            eval_step,
            in_shardings=(
                param_shardings(params, mesh, shard_embeddings),
                table_sharding(mesh, shard_embeddings),
                batch_shardings(batch, mesh),
            ),
            out_shardings=(repl, repl, repl),
        )(params, attrs_table, batch)

    return wrapped


def make_sharded_device_train_step(
    mc, tx, mesh: Mesh, *, shard_embeddings: bool = False,
    inner_steps: int = 1, reject_width: int = 0, neg_pop: bool = False,
    sparse_items: bool = False, tc=None, logq=None,
) -> Callable:
    """Device-pipeline train step over the mesh: (state, attrs_table,
    catalog_arrays, user_rows) → (state, loss).

    The HBM-resident catalog (CSR events + window bounds — tens of MB even
    at 100k users) is **replicated** on every chip; the per-step user-row
    vector is sharded ``P('data')``, so assembly, negative sampling, and
    the forward/backward all run sharded with zero host-shipped batch
    tensors — the multi-chip version of ``make_device_train_step``. The
    body mirrors it op-for-op (same RNG threading), so the sharded step is
    bit-identical to the single-device one (SPMD is semantics-preserving).
    With ``inner_steps > 1`` the rows are ``[K, B]`` and K steps run in one
    dispatch via ``lax.scan`` (the single-device scanned dispatch).
    """
    from carca_tpu.data.device_pipeline import assemble_train
    from carca_tpu.train.loop import _loss_opts
    lookup = _lookup_for(mesh, shard_embeddings)
    L = mc.seq_len
    n_neg = tc.n_train_negatives if tc is not None else 1
    lo = _loss_opts(tc, logq)

    def one_step(attrs_table, arrays, state: TrainState, rows):
        rng, step_rng, neg_rng = jax.random.split(state.rng, 3)
        batch = _constrain_batch(
            assemble_train(arrays, L, mc.n_items, rows, neg_rng,
                           reject_width, neg_pop, n_neg=n_neg), mesh)
        if sparse_items:
            # the sub-table gather/scatter is partitioned by XLA SPMD over
            # the row-sharded table; attrs lookups keep the shard_map path
            return _sparse_device_update(mc, tc, tx, state, batch, step_rng,
                                         rng, attrs_table, base_lookup=lookup,
                                         logq=logq)
        return apply_gradients(
            tx, state,
            lambda p: train_loss(mc, p, batch, step_rng, attrs_table,
                                 lookup=lookup, **lo), rng)

    if inner_steps > 1:
        def step(state, attrs_table, arrays, user_rows):
            return jax.lax.scan(partial(one_step, attrs_table, arrays),
                                state, user_rows, length=inner_steps)
    else:
        def step(state, attrs_table, arrays, user_rows):
            return one_step(attrs_table, arrays, state, user_rows)

    return _jit_sharded_device(step, mesh, shard_embeddings,
                               rows_dims=2 if inner_steps > 1 else 1)


def make_sharded_device_eval_step(
    mc, top_k: int, mesh: Mesh, mode: str, *,
    shard_embeddings: bool = False, inner_steps: int = 1,
    reject_width: int = 0,
) -> Callable:
    """Device-pipeline eval over the mesh: (params, attrs_table,
    catalog_arrays, user_rows, rng) → (hr_sum, ndcg_sum, loss, n_valid),
    reductions psum'd across chips by SPMD. Mirrors
    ``make_device_eval_step`` (scanned form takes ``[K, B]`` rows and
    ``[K]`` keys and matches ``make_scanned_device_eval_step``)."""
    from carca_tpu.data.device_pipeline import assemble_eval
    lookup = _lookup_for(mesh, shard_embeddings)

    def one_eval(params, attrs_table, arrays, rows, rng):
        batch = _constrain_batch(
            assemble_eval(arrays, mc.seq_len, mc.target_len, mc.n_items,
                          mode, rows, rng, reject_width), mesh)
        hr, ndcg, loss = eval_metrics(mc, top_k, params, batch, attrs_table,
                                      lookup=lookup)
        return hr, ndcg, loss, batch["n_valid"]

    if inner_steps > 1:
        def step(params, attrs_table, arrays, user_rows, keys):
            def body(_, xs):
                rows, key = xs
                return None, one_eval(params, attrs_table, arrays, rows, key)
            _, out = jax.lax.scan(body, None, (user_rows, keys),
                                  length=inner_steps)
            return out
    else:
        step = one_eval

    repl = NamedSharding(mesh, P())
    rows_spec = (P(None, "data") if inner_steps > 1 else P("data"))

    def wrapped(params, attrs_table, arrays, user_rows, keys):
        user_rows = put_if_multiprocess(user_rows,
                                        NamedSharding(mesh, rows_spec))
        arrays_repl = jax.tree_util.tree_map(lambda _: repl, arrays)
        fn = jax.jit(
            step,
            in_shardings=(
                param_shardings(params, mesh, shard_embeddings),
                table_sharding(mesh, shard_embeddings),
                arrays_repl,
                NamedSharding(mesh, rows_spec),
                repl,
            ),
            out_shardings=(repl, repl, repl, repl),
        )
        return fn(params, attrs_table, arrays, user_rows, keys)

    return wrapped


def _jit_sharded_device(step, mesh: Mesh, shard_embeddings: bool,
                        rows_dims: int):
    """jit the device-pipeline step with catalog arrays replicated and user
    rows sharded over ``data`` (last dim for the scanned [K, B] form)."""
    repl = NamedSharding(mesh, P())
    rows_spec = (P(None, "data") if rows_dims == 2 else P("data"))

    def wrapped(state, attrs_table, arrays, user_rows):
        user_rows = put_if_multiprocess(user_rows,
                                        NamedSharding(mesh, rows_spec))
        arrays_repl = jax.tree_util.tree_map(lambda _: repl, arrays)
        fn = jax.jit(
            step,
            in_shardings=(
                param_shardings(state, mesh, shard_embeddings),
                table_sharding(mesh, shard_embeddings),
                arrays_repl,
                NamedSharding(mesh, rows_spec),
            ),
            out_shardings=(
                param_shardings(state, mesh, shard_embeddings),
                repl,
            ),
            donate_argnums=(0,),
        )
        return fn(state, attrs_table, arrays, user_rows)

    return wrapped


def _jit_sharded(step, mc, mesh: Mesh, shard_embeddings: bool, donate: bool):
    """jit with explicit shardings derived from the first call's args.

    ``jax.jit`` caches per input-shape/sharding signature; deriving the
    sharding pytrees from the concrete args keeps this robust to any state
    layout (optax wraps differ between configs) at zero recompile cost.
    """
    repl = NamedSharding(mesh, P())

    def wrapped(state, attrs_table, batch):
        batch = put_if_multiprocess(batch, batch_shardings(batch, mesh))
        fn = jax.jit(
            step,
            in_shardings=(
                param_shardings(state, mesh, shard_embeddings),
                table_sharding(mesh, shard_embeddings),
                batch_shardings(batch, mesh),
            ),
            out_shardings=(
                param_shardings(state, mesh, shard_embeddings),
                repl,
            ),
            donate_argnums=(0,) if donate else (),
        )
        return fn(state, attrs_table, batch)

    return wrapped
