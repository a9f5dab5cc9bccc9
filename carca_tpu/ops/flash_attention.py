"""Fused masked multi-head attention as a Pallas TPU kernel.

Implements the reference's exact (nonstandard) attention semantics
(``src/carca.py:238-259``) in one VMEM-resident kernel per
(batch-block, head, q-block) grid cell — the pairwise mask is built *inside*
the kernel from the 1-D row masks (never materialized in HBM), logits get
the additive ``−(2³²−1)`` mask **before** the ``√(d/H)`` scaling, softmax
runs in fp32, the post-softmax re-mask zeroes fully-padded query rows,
dropout is applied **to the attention weights** with the on-core PRNG, and
the PV matmuls accumulate in fp32 on the MXU.

Backward is a second fused kernel (registered via ``jax.custom_vjp``) that
recomputes the weights block-wise — classic flash-attention
rematerialization — and regenerates the identical dropout bits from the same
per-block seed, so no ``[B,H,Lq,Lk]`` tensor ever exists in HBM in either
direction.

Why not textbook online-softmax flash? The CARCA regime is Lq ≤ ~512,
Lk ≤ ~256 (seq_len 50–200, eval candidates 101): a whole score tile fits
VMEM with room to spare, so a single-pass kernel with the full K in VMEM is
the speed-of-light shape here. Two grid refinements matter instead:

* ``block_b`` batch rows are processed per program with *batched*
  ``dot_general`` — at production batch sizes (B ≥ 1024) a per-(b,h) grid
  degenerates into thousands of latency-bound micro-programs (measured 86
  ms/step at B=2048 vs 3 ms with blocking);
* a q-block grid dimension keeps VMEM bounded for long sequences.

The pure-jnp path in ``carca_tpu.models.attention.mha_apply`` is the
correctness oracle; on non-TPU backends this module runs the same kernels in
interpret mode (and falls back to jnp when weight-dropout is active, since
the interpreter cannot lower the TPU PRNG primitives).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from carca_tpu.ops.precision import contract_precision
from jax.experimental.pallas import tpu as pltpu

NEG_MASK = -(2.0**32) + 1.0  # src/carca.py:251

_BATCHED_QKT = (((2,), (2,)), ((0,), (0,)))  # [BB,Lq,dh]x[BB,Lk,dh] → [BB,Lq,Lk]
_BATCHED_PV = (((2,), (1,)), ((0,), (0,)))  # [BB,Lq,Lk]x[BB,Lk,dh] → [BB,Lq,dh]
_BATCHED_T = (((1,), (1,)), ((0,), (0,)))  # [BB,Lq,Lk]ᵀ-style contraction


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _AttnConfig(NamedTuple):
    """Static (hashable) kernel configuration for custom_vjp dispatch."""

    causal: Optional[int]  # torch.tril diagonal offset, or None
    scale: float  # √(d/H); logits = (QKᵀ + add) / scale
    dropout_rate: float  # on attention weights (src/carca.py:258)
    block_b: int
    block_q: int
    interpret: bool
    compute_dtype: str  # matmul input dtype ("float32" | "bfloat16")


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _weights_block(cfg: _AttnConfig, q, k, qm, km, row0: jnp.ndarray):
    """Shared fwd/bwd math: masked softmax weights for one (b-block, q-block).

    q [BB, BQ, dh], k [BB, Lk, dh], qm [BB, BQ], km [BB, Lk]; ``row0`` =
    absolute position of the block's first query row. Returns (w_raw, m) —
    softmax output *before* the post-softmax re-mask, and the pair mask.
    """
    bb, bq, _ = q.shape
    lk = k.shape[1]
    cd = jnp.dtype(cfg.compute_dtype)
    s = jax.lax.dot_general(q.astype(cd), k.astype(cd),
                            dimension_numbers=_BATCHED_QKT,
                            preferred_element_type=jnp.float32,
                            precision=contract_precision(cd))
    m = qm[:, :, None] * km[:, None, :]
    if cfg.causal is not None:
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bb, bq, lk), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bb, bq, lk), 2)
        m = m * (cols <= rows + cfg.causal).astype(m.dtype)
    add = jnp.where(m > 0, 0.0, NEG_MASK)
    z = (s + add) * (1.0 / cfg.scale)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    p = jnp.exp(z)
    w_raw = p / jnp.sum(p, axis=-1, keepdims=True)
    return w_raw, m


def _dropout_bits(cfg: _AttnConfig, seed_ref, shape):
    """Per-(b-block, h, q-block) deterministic keep mask — identical in fwd
    and bwd."""
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nh, nq = pl.num_programs(1), pl.num_programs(2)
    pltpu.prng_seed(seed_ref[0] + (b * nh + h) * nq + i)
    bits = pltpu.prng_random_bits(shape)  # uint32
    keep = 1.0 - cfg.dropout_rate
    thresh = jnp.uint32(min(int(keep * (2.0**32)), 2**32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) < thresh


def _fwd_kernel(cfg: _AttnConfig, seed_ref, q_ref, k_ref, v_ref, qm_ref,
                km_ref, o_ref):
    i = pl.program_id(2)
    cd = jnp.dtype(cfg.compute_dtype)
    q, k, v = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0]  # [BB, L, dh]
    w_raw, m = _weights_block(cfg, q, k, qm_ref[:, 0], km_ref[:, 0],
                              i * cfg.block_q)
    w = w_raw * m  # post-softmax re-mask (src/carca.py:256)
    if cfg.dropout_rate > 0.0:
        keep_mask = _dropout_bits(cfg, seed_ref, w.shape)
        w = jnp.where(keep_mask, w * (1.0 / (1.0 - cfg.dropout_rate)), 0.0)
    o_ref[:, 0] = jax.lax.dot_general(
        w.astype(cd), v.astype(cd), dimension_numbers=_BATCHED_PV,
        preferred_element_type=jnp.float32,
        precision=contract_precision(cd))


def _bwd_kernel(cfg: _AttnConfig, seed_ref, q_ref, k_ref, v_ref, qm_ref,
                km_ref, do_ref, dq_ref, dk_ref, dv_ref):
    i = pl.program_id(2)
    cd = jnp.dtype(cfg.compute_dtype)
    q, k, v = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0]
    do = do_ref[:, 0]

    w_raw, m = _weights_block(cfg, q, k, qm_ref[:, 0], km_ref[:, 0],
                              i * cfg.block_q)
    wm = w_raw * m

    # dO → through dropout → through re-mask → softmax jacobian → QKᵀ
    dwd = jax.lax.dot_general(  # dO Vᵀ : [BB, BQ, Lk]
        do.astype(cd), v.astype(cd), dimension_numbers=_BATCHED_QKT,
        preferred_element_type=jnp.float32,
        precision=contract_precision(cd))
    if cfg.dropout_rate > 0.0:
        keep_mask = _dropout_bits(cfg, seed_ref, dwd.shape)
        inv_keep = 1.0 / (1.0 - cfg.dropout_rate)
        wd = jnp.where(keep_mask, wm * inv_keep, 0.0)
        dwm = jnp.where(keep_mask, dwd * inv_keep, 0.0)
    else:
        wd = wm
        dwm = dwd
    dw_raw = dwm * m
    dz = w_raw * (dw_raw - jnp.sum(dw_raw * w_raw, axis=-1, keepdims=True))
    ds = dz * (1.0 / cfg.scale)

    dsc = ds.astype(cd)
    dq_ref[:, 0] = jax.lax.dot_general(  # dS K : [BB, BQ, dh]
        dsc, k.astype(cd), dimension_numbers=_BATCHED_PV,
        preferred_element_type=jnp.float32,
        precision=contract_precision(cd))

    @pl.when(i == 0)
    def _():
        dk_ref[:, 0] = jnp.zeros_like(dk_ref[:, 0])
        dv_ref[:, 0] = jnp.zeros_like(dv_ref[:, 0])

    dk_ref[:, 0] += jax.lax.dot_general(  # dSᵀ Q : [BB, Lk, dh]
        dsc, q.astype(cd), dimension_numbers=_BATCHED_T,
        preferred_element_type=jnp.float32,
        precision=contract_precision(cd))
    dv_ref[:, 0] += jax.lax.dot_general(  # (wd)ᵀ dO : [BB, Lk, dh]
        wd.astype(cd), do.astype(cd), dimension_numbers=_BATCHED_T,
        preferred_element_type=jnp.float32,
        precision=contract_precision(cd))


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _specs(cfg: _AttnConfig, lqp: int, lkp: int, dh: int):
    bb, bq = cfg.block_b, cfg.block_q
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec((bb, 1, bq, dh), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((bb, 1, lkp, dh), lambda b, h, i: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((bb, 1, lkp, dh), lambda b, h, i: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((bb, 1, bq), lambda b, h, i: (b, 0, i),
                     memory_space=pltpu.VMEM),  # q_mask [B, 1, Lqp]
        pl.BlockSpec((bb, 1, lkp), lambda b, h, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # k_mask [B, 1, Lkp]
    ]
    q_like = pl.BlockSpec((bb, 1, bq, dh), lambda b, h, i: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_like = pl.BlockSpec((bb, 1, lkp, dh), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    return in_specs, q_like, kv_like


def _cost(b: int, h: int, lq: int, lk: int, dh: int, n_matmuls: int):
    return pl.CostEstimate(
        flops=n_matmuls * 2 * b * h * lq * lk * dh,
        bytes_accessed=4 * b * h * (lq * dh * 2 + lk * dh * 2),
        transcendentals=b * h * lq * lk,
    )


def _grid(cfg: _AttnConfig, b: int, h: int, lqp: int):
    return (b // cfg.block_b, h, lqp // cfg.block_q)


def _fwd_call(cfg: _AttnConfig, qh, kh, vh, qm, km, seed):
    b, h, lqp, dh = qh.shape
    lkp = kh.shape[2]
    in_specs, q_like, _ = _specs(cfg, lqp, lkp, dh)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=_grid(cfg, b, h, lqp),
        in_specs=in_specs,
        out_specs=q_like,
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dh), jnp.float32),
        cost_estimate=_cost(b, h, lqp, lkp, dh, 2),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=cfg.interpret,
    )(seed, qh, kh, vh, qm, km)


def _bwd_call(cfg: _AttnConfig, qh, kh, vh, qm, km, seed, do):
    b, h, lqp, dh = qh.shape
    lkp = kh.shape[2]
    in_specs, q_like, kv_like = _specs(cfg, lqp, lkp, dh)
    in_specs = in_specs + [q_like]  # do
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=_grid(cfg, b, h, lqp),
        in_specs=in_specs,
        out_specs=(q_like, kv_like, kv_like),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lqp, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lkp, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lkp, dh), jnp.float32),
        ),
        cost_estimate=_cost(b, h, lqp, lkp, dh, 5),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=cfg.interpret,
    )(seed, qh, kh, vh, qm, km, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attention(cfg: _AttnConfig, qh, kh, vh, qm, km, seed):
    return _fwd_call(cfg, qh, kh, vh, qm, km, seed)


def _attention_fwd(cfg, qh, kh, vh, qm, km, seed):
    out = _fwd_call(cfg, qh, kh, vh, qm, km, seed)
    return out, (qh, kh, vh, qm, km, seed)


def _attention_bwd(cfg, res, g):
    qh, kh, vh, qm, km, seed = res
    dq, dk, dv = _bwd_call(cfg, qh, kh, vh, qm, km, seed, g)
    return (dq.astype(qh.dtype), dk.astype(kh.dtype), dv.astype(vh.dtype),
            jnp.zeros_like(qm), jnp.zeros_like(km), None)


_attention.defvjp(_attention_fwd, _attention_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _bwd_vmem_bytes(bb: int, bq: int, lkp: int, dh: int) -> int:
    """Estimated per-program VMEM working set of the bwd kernel (the larger
    of the two) at batch block ``bb``, in bytes.

    VMEM arrays are tiled (8, 128): the minor dim pads to a 128-lane
    multiple — at dh=32 a K/V block really occupies 4× its logical size.
    Counts: double-buffered input blocks (q, k, v, do), output accumulators
    (dq, dk, dv), and ~8 live [bb, bq, lkp] fp32 score-shaped temporaries.
    """
    lane = lambda x: _round_up(x, 128)
    sub = lambda x: _round_up(x, 8)
    q_like = bb * sub(bq) * lane(dh) * 4
    kv_like = bb * sub(lkp) * lane(dh) * 4
    score = bb * sub(bq) * lane(lkp) * 4
    return 2 * (2 * q_like + 2 * kv_like) + (q_like + 2 * kv_like) + 8 * score


_VMEM_LIMIT = 32 * 1024 * 1024  # raised from Mosaic's 16 MB default


def _pick_block_b(b: int, bq: int, lkp: int, dh: int) -> int:
    """Largest power-of-two divisor of B whose bwd working set stays under
    ~2/3 of the scoped-VMEM limit (leaves slack for Mosaic's own scratch),
    capped at 32 rows per program."""
    budget = (_VMEM_LIMIT * 2) // 3
    bb = 1
    while (bb * 2 <= min(b, 32) and b % (bb * 2) == 0
           and _bwd_vmem_bytes(bb * 2, bq, lkp, dh) <= budget):
        bb *= 2
    return bb


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: jnp.ndarray,
    k_mask: jnp.ndarray,
    *,
    causal: Optional[int],
    scale: float,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    n_heads: int = 1,
    block_q: int = 512,
    block_b: Optional[int] = None,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Fused attention on post-projection tensors.

    q [B, Lq, d], k/v [B, Lk, d], masks [B, Lq]/[B, Lk] (float 0/1).
    Returns the merged-head context [B, Lq, d] in float32. Padding along L
    is inserted (and stripped) here; padded rows are fully masked, which the
    post-softmax re-mask turns into exact zeros, so padding never changes
    results.
    """
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // n_heads
    dropout_on = dropout_rate > 0.0 and rng is not None
    interpret = jax.default_backend() != "tpu"

    if interpret and dropout_on:
        # interpreter can't lower the TPU PRNG — use the jnp oracle math
        return _jnp_fallback(q, k, v, q_mask, k_mask, causal=causal,
                             scale=scale, dropout_rate=dropout_rate, rng=rng,
                             n_heads=n_heads, compute_dtype=compute_dtype)

    def heads(x, l):
        return x.reshape(b, l, n_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, lq), heads(k, lk), heads(v, lk)

    bq = min(block_q, max(8, _round_up(lq, 8)))
    lkp = _round_up(lk, 128 if not interpret else 8)
    # shrink the q block until even bb=1 fits the budget; if the K/V blocks
    # alone overflow (enormous Lk), the kernel has no valid tiling — use the
    # jnp math rather than failing at Mosaic compile time
    budget = (_VMEM_LIMIT * 2) // 3
    while bq > 8 and _bwd_vmem_bytes(1, bq, lkp, dh) > budget:
        bq = max(8, _round_up(bq // 2, 8))
    if _bwd_vmem_bytes(1, bq, lkp, dh) > budget:
        return _jnp_fallback(q, k, v, q_mask, k_mask, causal=causal,
                             scale=scale, dropout_rate=dropout_rate, rng=rng,
                             n_heads=n_heads, compute_dtype=compute_dtype)
    lqp = _round_up(lq, bq)
    bb = block_b or _pick_block_b(b, bq, lkp, dh)
    qh = jnp.pad(qh, ((0, 0), (0, 0), (0, lqp - lq), (0, 0)))
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, lkp - lk), (0, 0)))
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, lkp - lk), (0, 0)))
    qm = jnp.pad(q_mask.astype(jnp.float32), ((0, 0), (0, lqp - lq)))[:, None, :]
    km = jnp.pad(k_mask.astype(jnp.float32), ((0, 0), (0, lkp - lk)))[:, None, :]

    if dropout_on:
        seed = jax.random.randint(rng, (1,), 0, 2**30, dtype=jnp.int32)
        rate = float(dropout_rate)
    else:
        seed = jnp.zeros((1,), jnp.int32)
        rate = 0.0

    cfg = _AttnConfig(
        causal=causal, scale=float(scale), dropout_rate=rate, block_b=bb,
        block_q=bq, interpret=interpret, compute_dtype=compute_dtype,
    )
    out = _attention(cfg, qh, kh, vh, qm, km, seed)  # [B, H, Lqp, dh]
    out = out[:, :, :lq, :].transpose(0, 2, 1, 3).reshape(b, lq, d)
    return out


def _jnp_fallback(q, k, v, q_mask, k_mask, *, causal, scale, dropout_rate,
                  rng, n_heads, compute_dtype="float32"):
    """Delegates to THE shared jnp reference-attention core
    (``models.attention.masked_attention``) — the fallback cannot drift
    from the oracle because it IS the oracle."""
    from carca_tpu.models.attention import masked_attention

    return masked_attention(
        q, k, v, q_mask, k_mask, n_heads=n_heads, causal=causal, scale=scale,
        dropout_rate=dropout_rate, train=rng is not None or dropout_rate <= 0,
        rng=rng, compute_dtype=compute_dtype)
