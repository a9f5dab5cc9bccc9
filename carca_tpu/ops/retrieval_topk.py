"""Fused catalog-scoring + running top-k Pallas kernel.

The XLA retrieval path materializes the ``[B, n_items]`` score matrix in
HBM (write + re-read for top_k ≈ 2 GB per 256-query batch at 1M items) —
that traffic, not the matmul, bounds throughput. This kernel streams the
catalog through VMEM in chunks: per grid step it computes one ``[B, C]``
score tile on the MXU, extracts the tile's top-K by iterative
max-and-suppress on the VPU, and merges into a running ``[B, K]``
best-list kept in the output refs. HBM traffic drops to one read of the
catalog embeddings per query batch.

Top-K inside a kernel: Mosaic has no sort/top_k primitive, so K is
extracted by K rounds of (row-max → first-argmax via iota-min → suppress
to −inf). K is small (10–64: ``k`` plus the exclusion-list slack the
caller filters afterward), so the VPU cost is ~K·[B,C] ops per tile —
small next to the score matmul for C ≥ 1024.

Used by ``carca_tpu.parallel.retrieval.full_catalog_topk`` on the
single-device path and per-shard under ``shard_map`` on the row-sharded
path (each shard streams only its rows; the cross-shard merge stays the
O(shards·k) all-gather).

Two methods (``catalog_topk(method=...)``): ``"stream"`` — the running
top-k above; ``"tournament"`` — group-max + exact winner rerank
(``_tournament_topk``), which replaces the k suppress rounds (the
measured at-scale bottleneck, DESIGN §11d) with one lane-reduce per
tile and returns top-k under TRUE f32 (HIGHEST-precision) scores.
``"auto"`` routes on the measured row-count crossover. Precision note
(measured, DESIGN §11d): on TPU the stream kernel and the XLA fallback
score f32 catalogs with XLA's DEFAULT single bf16 pass (~2^-8
relative); the tournament is the more accurate path, so methods may
order near-bf16-ties differently on TPU (identically on CPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from carca_tpu.ops.precision import contract_precision
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
_BIG_COL = 2**30


class QuantizedIndex(NamedTuple):
    """Symmetric per-row int8 catalog index: row r of the f32/bf16
    embedding matrix is ``qvals[r] * scales[0, r]``. Quarters the HBM
    catalog scan vs f32 (halves vs bf16) — the scan is what bounds
    retrieval throughput at multi-million-item catalogs (module
    docstring). Build with ``quantize_index`` AFTER
    ``catalog_in_decoder_space`` (the scales bake in the row geometry,
    so the transform cannot be applied afterwards)."""

    qvals: jnp.ndarray   # [R, d] int8
    scales: jnp.ndarray  # [1, R] float32 (kernel-friendly row layout)

    @property
    def rows(self) -> int:
        return self.qvals.shape[0]


def quantize_index(e: jnp.ndarray) -> QuantizedIndex:
    """[R, d] float → per-row symmetric int8 (max-abs scaling).

    An all-zero row (the pad) gets scale 0 and scores exactly 0. Ranking
    error is bounded by the per-element quantization step (≤ max|row|/127
    per coordinate); near-ties may reorder — the serving rerank stage
    re-scores shortlists exactly, and ``tests/test_retrieval.py`` pins the
    end-to-end recall impact."""
    e = e.astype(jnp.float32)
    s = jnp.max(jnp.abs(e), axis=1) / 127.0
    q = jnp.where(s[:, None] > 0, jnp.round(e / jnp.maximum(s, 1e-30)[:, None]), 0.0)
    return QuantizedIndex(
        jnp.clip(q, -127, 127).astype(jnp.int8),
        s.astype(jnp.float32)[None, :])


def dequantize_index(qi: QuantizedIndex) -> jnp.ndarray:
    """Exact float reconstruction of the quantized rows (the XLA fallback
    path and tests score against this)."""
    return qi.qvals.astype(jnp.float32) * qi.scales[0][:, None]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _extract_topk_inplace(s_ref, ids, k: int):
    """K rounds of max-and-suppress over the VMEM buffer ``s_ref`` [B, C]
    → ([B, k] winner values, [B, k] winner ids) as loop-carried arrays.

    A ``fori_loop`` with in-place suppression keeps one live [B, C] buffer
    regardless of K (the unrolled functional version exceeded the 16 MB
    scoped-VMEM limit at K≳32); winners land in their slot via a one-hot
    select (Mosaic cannot store at a dynamic lane index). Ties resolve to
    the lowest id — matching jax.lax.top_k's stable first-occurrence order;
    ``ids`` are the payload identifiers, selected by masked min/sum (no
    general gather on Mosaic)."""
    b = s_ref.shape[0]
    kcols = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def body(t, carry):
        wv, wi = carry
        s = s_ref[:]
        m = jnp.max(s, axis=1, keepdims=True)  # [B, 1]
        eq = s == m
        idx = jnp.min(jnp.where(eq, ids, _BIG_COL), axis=1, keepdims=True)
        sel = ids == idx
        slot = kcols == t
        wv = jnp.where(slot, m, wv)
        wi = jnp.where(slot, idx, wi)
        s_ref[:] = jnp.where(sel, NEG_INF, s)
        return wv, wi

    return jax.lax.fori_loop(
        0, k, body,
        (jnp.full((b, k), NEG_INF, jnp.float32), jnp.zeros((b, k), jnp.int32)))


_PACK_BITS = 12           # lane-id payload width (chunk ≤ 4096 columns)
_PACK_MASK = (1 << _PACK_BITS) - 1
_KEY_MIN = -(2**31)       # masked-entry key (and suppression sentinel)


def _float_key(s: jnp.ndarray) -> jnp.ndarray:
    """f32 → int32 key with float ordering preserved under SIGNED integer
    compare (flip the low 31 bits of negatives — the classic IEEE trick).
    Integer domain matters: packing an id payload into low *mantissa* bits
    was measured to break on scores of exactly 0.0 — the payload lands in
    the denormal range and the VPU's flush-to-zero erases it, so the
    suppress-by-equality wiped whole rows (zero queries are routine: batch
    padding embeds to zero). Integers don't flush."""
    b = jax.lax.bitcast_convert_type(s, jnp.int32)
    return jnp.where(b < 0, b ^ jnp.int32(0x7FFFFFFF), b)


def _key_float(key: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``_float_key`` (payload bits must already be cleared)."""
    fb = jnp.where(key < 0, key ^ jnp.int32(0x7FFFFFFF), key)
    return jax.lax.bitcast_convert_type(fb, jnp.float32)


def _extract_topk_packed(key_ref, col0, k: int):
    """Top-k extraction over an int32 key buffer whose low ``_PACK_BITS``
    carry each entry's lane id (see the packing in ``_kernel``).

    Packed keys are unique per row (masked entries excepted — they sit at
    exactly ``_KEY_MIN`` and can only "win" in an exhausted row), so each
    round is just row-max + suppress-by-equality — 2 VMEM passes instead
    of the id-recovery variant's ~6 (``_extract_topk_inplace``). The id
    payload perturbs scores by ≤ 2^-11 relative (less than the bf16 input
    rounding of the modes this path serves), so it is used only for
    bf16/int8 catalogs — the f32 path keeps exact-parity extraction.
    Near-tie order is payload-defined and unspecified in these modes."""
    b = key_ref.shape[0]
    kcols = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def body(t, carry):
        wv, wi = carry
        s = key_ref[:]
        m = jnp.max(s, axis=1, keepdims=True)  # [B, 1] int key max
        key_ref[:] = jnp.where(s == m, jnp.int32(_KEY_MIN), s)
        mk = m[:, 0]
        cleared = mk & ~jnp.int32(_PACK_MASK)
        gid = (col0 + (mk & _PACK_MASK))[:, None]
        val = jnp.where(cleared == _KEY_MIN, NEG_INF,
                        _key_float(cleared))[:, None]
        slot = kcols == t
        wv = jnp.where(slot, val, wv)
        wi = jnp.where(slot, gid, wi)
        return wv, wi

    return jax.lax.fori_loop(
        0, k, body,
        (jnp.full((b, k), NEG_INF, jnp.float32), jnp.zeros((b, k), jnp.int32)))


def _groupmax_kernel(chunk: int, group: int, lim_ref, q_ref, e_ref, *rest):
    """Stage 1 of the tournament top-k: per grid step score one [B, C]
    tile on the MXU and emit only the per-``group``-column maxima
    [B, C/group] — one lane-reduce instead of the streaming kernel's
    k·(2..6) suppress passes, which are the measured at-scale bottleneck
    (module docstring / DESIGN §11b). Winner groups are reranked exactly
    outside the kernel (``_tournament_topk``)."""
    if len(rest) == 2:
        scl_ref, gm_ref = rest
    else:
        scl_ref, (gm_ref,) = None, rest
    j = pl.program_id(0)
    b = q_ref.shape[0]
    q = q_ref[:]  # [B, d]
    e = e_ref[:]  # [C, d] — f32 / bf16 / int8
    cd = jnp.bfloat16 if e.dtype == jnp.int8 else e.dtype
    # scores TRANSPOSED ([C, B], catalog rows in sublanes): the group
    # reduction then runs over sublanes and the [C/group, B] output block
    # satisfies Mosaic's (8, 128)-divisible block constraint — a [B,
    # C/group] block (C/group = 32 lanes per 4096-chunk) does not.
    # HIGHEST on f32: DEFAULT would score with a single bf16 pass
    # (~2^-8 relative — measured 0.11 abs on N(0,1) d=64 dots); the
    # tournament's contract is top-k under TRUE f32 scores, so both this
    # selection stage and the rerank run f32 at HIGHEST. bf16 operands
    # must NOT carry the flag — Mosaic rejects fp32 contract precision on
    # bf16 lhs ("Bad lhs type"); their products are exact either way.
    # Explicit DEFAULT, not None: None INHERITS the ambient
    # jax_default_matmul_precision, and the test conftest pins that to
    # "highest" — which put fp32 contract precision right back on the
    # bf16 dots and broke every kernel test on real hardware (round 5).
    s = jax.lax.dot_general(
        e.astype(cd), q.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if cd == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )  # [C, B]
    if scl_ref is not None:
        s = s * scl_ref[:]  # [C, 1] per-row dequantization scales
    col0 = j * chunk
    # The mask runs unconditionally: a round-4 A/B that skipped it for
    # interior tiles on a runtime scalar branch (only the column-0 tile
    # and limit-crossing tiles need it) measured the BRANCHED kernel
    # ~2% slower (16.61 vs 16.22 ms median, interleaved, 10M bf16) —
    # the scalar branch around the vector epilogue costs more than the
    # ~4 VPU masking passes it saves. Don't re-attempt.
    gids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    bad = (gids >= lim_ref[0]) | ((gids == 0) & (lim_ref[1] == 1))
    s = jnp.where(bad, NEG_INF, s)
    gm_ref[:] = jnp.max(s.reshape(chunk // group, group, b), axis=1)


def _groupmax_bq_kernel(chunk: int, group: int, quad: int, lim_ref, q_ref,
                        e_ref, *rest):
    """Stage-1 kernel of the RECURSIVE tournament: like
    ``_groupmax_kernel`` but emits the per-group maxima in ``[B, G]``
    (query-major) layout, so stage 2 never materializes the [G, B]
    transpose that bounded the flat tournament at multi-million-item
    catalogs (DESIGN §11d addendum).

    Scores are computed in natural [B, C] orientation; the per-group
    lane-reduce gives [B, C/group]. A [B, C/group] output block violates
    Mosaic's 128-lane constraint (the round-3 lesson), so ``quad``
    consecutive programs share one [B, 128]-lane output block
    (index_map j → j // quad): Mosaic keeps a revisited output block in
    VMEM until the block index changes, so each program merges its
    ``C/group`` lanes into the live block (tile + lane-slot select — no
    dynamic lane stores) and the block is written to HBM once."""
    if len(rest) == 2:
        scl_ref, gm_ref = rest
    else:
        scl_ref, (gm_ref,) = None, rest
    j = pl.program_id(0)
    b = q_ref.shape[0]
    q = q_ref[:]  # [B, d]
    e = e_ref[:]  # [C, d]
    cd = jnp.bfloat16 if e.dtype == jnp.int8 else e.dtype
    # same dtype/precision contract as _groupmax_kernel: TRUE f32 scores
    # (HIGHEST) for f32 catalogs; bf16 operands must not carry the flag
    s = jax.lax.dot_general(
        q.astype(cd), e.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if cd == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )  # [B, C]
    if scl_ref is not None:
        s = s * scl_ref[:]  # [1, C] per-row dequantization scales
    col0 = j * chunk
    gids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    bad = (gids >= lim_ref[0]) | ((gids == 0) & (lim_ref[1] == 1))
    s = jnp.where(bad, NEG_INF, s)
    gpc = chunk // group
    gmax = jnp.max(s.reshape(b, gpc, group), axis=2)  # [B, gpc]
    vt = jnp.tile(gmax, (1, quad))                    # [B, 128]
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, quad * gpc), 1) // gpc
    m = j % quad

    @pl.when(m == 0)
    def _init():
        gm_ref[:] = jnp.where(slot == 0, vt, NEG_INF)

    @pl.when(m != 0)
    def _merge():
        gm_ref[:] = jnp.where(slot == m, vt, gm_ref[:])


# Tournament-vs-stream crossover (measured on v5e, B=256, d=64, f32/
# bf16/int8 x k=10/60 at 2^16..2^20 rows): the stream kernel's k-round
# suppress is O(k*B*R) VPU passes, so the tournament's advantage grows
# with R*k  -- >=1M rows it wins at every dtype/k (1.16-3.24x, still
# growing); at 512k it wins for large k (k=60: 1.16-1.84x) but not
# small; below that its fixed costs (group top-k, winner gather/rerank)
# dominate. "auto" in catalog_topk routes on both row count and k.
_TOURNAMENT_MIN_ROWS = 1_048_576
_TOURNAMENT_MIN_ROWS_BIG_K = 524_288  # k >= 48: measured win at 2^19
_GROUP = 128  # one VPU lane row per group max
# Recursive stage 2 (query-major kernel layout + level-2 lane max + two
# narrow top_ks) is a MEASURED NEGATIVE on v5e and is off by default —
# exact and tested (forced via this constant in tests), but slower than
# the flat path at 10M bf16 B=256 k=10: kernel 15.25 → 22.63 ms (the
# [B, C]-orientation dot makes Mosaic transpose each catalog tile into
# the MXU) and stage 2 5.64 → 11.69 ms (take_along_axis on [B, 78k]
# gathers at scalar granularity, ~12.8 ms for 590k elements — same
# per-element floor as the §12 scatter results — while the transpose +
# wide top_k it replaces fuse to 5.6 ms). Chunk sweep 2048/4096: flat
# path unchanged (26.9/26.1 ms) — the scan kernel is dot+VPU-reduce
# compute-bound (~84 GB/s effective vs the 1.6 ms DMA floor), so
# stage-2 surgery cannot move the 10M headline. DESIGN §11d round-4
# addendum has the full decomposition.
_RECURSIVE_MIN_GROUPS = 1 << 62  # off: measured negative (see above)


def _tournament_topk(q, catalog_emb, scales, k: int, n_items, id_offset,
                     chunk: int, interpret: bool,
                     group: int = _GROUP):
    """Exact top-k via group-max tournament + winner rerank.

    Stage 1 streams the catalog once and keeps only each 128-column
    group's max score (``_groupmax_kernel``). Stage 2: ``lax.top_k`` over
    the [B, R/128] maxima picks k winner groups per row — the union of
    the top-k groups provably contains the true top-k (if an element of
    the true top-k sat in an unpicked group, the k picked groups' maxima
    would each strictly precede it in (value, first-occurrence) order —
    k elements ahead of a top-k element, contradiction; lax.top_k's
    lowest-index tie order makes this exact under ties too). Stage 3
    re-scores the ≤ (k+8)·128 winner columns — same dtype and HIGHEST
    precision as the selection kernel — and top-ks them; winner groups
    are sorted ascending first so the final lax.top_k's first-occurrence
    tie break matches global column order. Contract: exact top-k under
    TRUE f32 scores of the (possibly bf16/int8-rounded) catalog — never
    packs id bits into scores (unlike the stream bf16/int8 modes) and
    never drops to DEFAULT's single bf16 pass (unlike the stream f32
    mode ON TPU — module docstring precision note).
    """
    b, d = q.shape
    r = catalog_emb.shape[0]
    if b > 16384:
        raise ValueError(
            f"query batch {b} needs a >8 MB VMEM score tile even at the "
            f"minimum 128-column chunk; split the query batch instead")
    b_req = b
    if b < 8:
        # pad the query batch to one full sublane tile: Mosaic mis-lowers
        # the degenerate [C,d]·[b,d] dot for b < 8 on a bf16/int8 catalog
        # ("'vector.broadcast' op ... same element type" verify error —
        # hit by carca-serve's batch-1 bucket on the 10M int8 index,
        # round 5; interpret-mode tests cannot catch it, CLAUDE.md)
        q = jnp.pad(q, ((0, 8 - b), (0, 0)))
        b = 8
    c_cap = max(group, (2_000_000 // max(b, 1)) // group * group)
    c = min(chunk, c_cap, _round_up(r, group))
    c = max(c // group * group, group)
    # flat-path Mosaic constraint: the (c//group, b) output block needs
    # its sublane dim divisible by 8 (chunk=7680 → 60 groups crashed the
    # lowering). Round the chunk's group count to a multiple of 8; when
    # the VMEM cap forced fewer than 8 groups (huge query batches),
    # raise it to 8 — the [b, 8·group] f32 score tile stays ≤ 8 MB for
    # b ≤ 2048; beyond that the batch must be split anyway.
    # (note: `chunk` is a tuning HINT — VMEM caps and these lowering
    # constraints may shrink or grow it)
    if c // group >= 8:
        c = (c // group // 8 * 8) * group
    elif b <= 2048:
        c = 8 * group
    elif c >= _round_up(r, group):
        # whole padded catalog fits one chunk → single-program grid, and
        # a block whose sublane dim EQUALS the array dim is legal even
        # when not divisible by 8 (advisor, round 4: huge-batch callers
        # with small catalogs lowered fine before the 8-group rounding)
        pass
    else:
        raise ValueError(
            f"query batch {b} forces a <8-group chunk whose output block "
            f"Mosaic cannot lower; split the query batch")
    # recursive stage 2 for big catalogs: the [B, G]-layout kernel needs
    # G padded to a 128-lane multiple and chunks whose group count
    # divides 128 (quad programs share each output block)
    recursive = _round_up(r, group) // group >= _RECURSIVE_MIN_GROUPS
    if recursive:
        gpc = max(1, min(c // group, 128))
        gpc = 1 << (gpc.bit_length() - 1)  # power of two ≤ 128
        c = gpc * group
        quad = 128 // gpc
        rp = _round_up(r, 128 * group)
    else:
        rp = _round_up(r, c)
    pad = rp - r
    if pad:
        catalog_emb = jnp.pad(catalog_emb, ((0, pad), (0, 0)))
        if scales is not None:
            scales = jnp.pad(scales, ((0, 0), (0, pad)))
    id_offset = jnp.asarray(id_offset, jnp.int32)
    lim0 = jnp.minimum(jnp.asarray(n_items, jnp.int32) - id_offset,
                       jnp.asarray(r, jnp.int32))
    lim = jnp.stack([lim0, (id_offset == 0).astype(jnp.int32)])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lim (2,)
        pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
    ]
    args = [lim, q, catalog_emb]
    n_groups = rp // group
    cost = pl.CostEstimate(
        flops=2 * b * rp * d,
        bytes_accessed=(rp * d * catalog_emb.dtype.itemsize
                        + b * d * q.dtype.itemsize),
        transcendentals=0,
    )
    if recursive:
        if scales is not None:
            # [1, R] as-is: the query-major score tile wants per-row
            # scales along the lane axis
            in_specs.append(
                pl.BlockSpec((1, c), lambda j: (0, j),
                             memory_space=pltpu.VMEM))
            args.append(scales)
        gmat = pl.pallas_call(
            functools.partial(_groupmax_bq_kernel, c, group, quad),
            grid=(rp // c,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, 128), lambda j: (0, j // quad),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_groups), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(*args)  # [B, G] per-group maxima, query-major — no transpose
        # level-2 tournament: lane-max over 128-group super-groups, pick
        # k+8 super-groups, then top-k level-1 groups among only their
        # (k+8)·128 candidate maxima. Both top_ks are narrow; the wide
        # [B, G] array is read once by the level-2 reduce and once by the
        # (contiguous 128-lane-span) candidate gather. Exactness: the
        # containment proof applies per level — an unpicked super-group
        # tied with a picked one has the higher super-group id, so every
        # level-1 group inside it also follows in global (value,
        # first-occurrence) order; super-group maxima are bitwise maxima
        # of the same level-1 array, so no new ulp margin is needed.
        n2 = n_groups // 128
        gm2 = jnp.max(gmat.reshape(b, n2, 128), axis=2)  # [B, G/128]
        kg2 = min(k + 8, n2)
        _, gi2 = jax.lax.top_k(gm2, kg2)   # ties → lowest super-group
        gi2 = jnp.sort(gi2, axis=1)
        # candidate level-1 ids ascend globally (sorted contiguous
        # blocks), so the level-1 top_k's lowest-index tie break below
        # is again lowest-group-id — the flat path's order exactly
        cand = (gi2[:, :, None] * 128
                + jnp.arange(128, dtype=jnp.int32)).reshape(b, kg2 * 128)
        cvals = jnp.take_along_axis(gmat, cand, axis=1)
        kg = min(k + 8, n_groups)
        _, sel = jax.lax.top_k(cvals, kg)
        gi = jnp.take_along_axis(cand, sel, axis=1)
        gi = jnp.sort(gi, axis=1)          # restore global column order
    else:
        if scales is not None:
            # [1, R] → [R, 1] (a free reshape): the transposed score tile
            # wants per-row scales down the sublane axis
            in_specs.append(
                pl.BlockSpec((c, 1), lambda j: (j, 0),
                             memory_space=pltpu.VMEM))
            args.append(scales.reshape(-1, 1))
        gm = pl.pallas_call(
            functools.partial(_groupmax_kernel, c, group),
            grid=(rp // c,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((c // group, b), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_groups, b), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(*args).T  # [B, n_groups] per-group maxima

        # +8 margin groups: kernel maxima and rerank scores agree to
        # accumulation-order ulps (both HIGHEST); the margin makes a
        # dropped boundary group require 8+ group maxima inside that ulp
        # window. Exact ties are still exact: equal maxima order by group
        # id on both sides (the containment proof needs only that).
        kg = min(k + 8, n_groups)
        _, gi = jax.lax.top_k(gm, kg)      # ties → lowest group id first
        gi = jnp.sort(gi, axis=1)          # restore global column order

    # rerank the winner groups exactly, in memory-bounded slices: the
    # gathered winner rows are [B, kc, group, d] per slice (the score
    # output is tiny — only the gather is capacity-bound)
    cat = catalog_emb.reshape(n_groups, group, d)
    cd = jnp.bfloat16 if cat.dtype == jnp.int8 else cat.dtype
    qc = q.astype(cd)
    scl = scales[0].reshape(n_groups, group) if scales is not None else None
    slice_bytes = b * group * d * cat.dtype.itemsize
    kc = max(1, min(kg, (128 << 20) // max(slice_bytes, 1)))
    ns = -(-kg // kc)
    gpad = ns * kc - kg
    gi_p = jnp.pad(gi, ((0, 0), (0, gpad)))  # dup-padded; masked below

    def score_slice(gis):  # [B, kc] group ids → [B, kc, group] scores
        rows = cat[gis]                          # [B, kc, group, d]
        s = jnp.einsum("bd,bkgd->bkg", qc, rows.astype(cd),
                       preferred_element_type=jnp.float32,
                       precision=(jax.lax.Precision.HIGHEST
                                  if cd == jnp.float32 else None))
        if scl is not None:
            s = s * scl[gis]
        return s

    if ns == 1:
        s2 = score_slice(gi_p)
    else:
        s2 = jax.lax.map(score_slice,
                         jnp.moveaxis(gi_p.reshape(b, ns, kc), 1, 0))
        s2 = jnp.moveaxis(s2, 0, 1).reshape(b, ns * kc, group)

    lids = gi_p[:, :, None] * group + jnp.arange(group, dtype=jnp.int32)
    pad_slot = (jnp.arange(ns * kc, dtype=jnp.int32) >= kg)[None, :, None]
    bad = (pad_slot | (lids >= lim0)
           | ((lids == 0) & (id_offset == 0)))
    s2 = jnp.where(bad, NEG_INF, s2).reshape(b, ns * kc * group)
    lids = lids.reshape(b, ns * kc * group)
    v, sel = jax.lax.top_k(s2, k)
    cols = jnp.take_along_axis(lids, sel, axis=1)
    return (v[:b_req],
            jnp.where(v > NEG_INF, cols + id_offset, 0)[:b_req])


def _kernel(k: int, chunk: int, lim_ref, q_ref, e_ref, *rest):
    # lim_ref (SMEM int32[2]): [n_valid_local, mask_row0] — runtime scalars
    # so a shard_map shard can pass its traced offset window.
    # With an int8 index ``rest`` leads with the [1, C] row-scale block.
    if len(rest) == 4:
        scl_ref, ov_ref, oi_ref, s_ref = rest
    else:
        scl_ref, (ov_ref, oi_ref, s_ref) = None, rest
    j = pl.program_id(0)
    b = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        ov_ref[:] = jnp.full_like(ov_ref, NEG_INF)
        oi_ref[:] = jnp.zeros_like(oi_ref)

    q = q_ref[:]  # [B, d]
    e = e_ref[:]  # [C, d] — may be bf16 (halves the HBM scan) or int8
    cd = jnp.bfloat16 if e.dtype == jnp.int8 else e.dtype
    s = jax.lax.dot_general(
        q.astype(cd), e.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=contract_precision(cd),
    )  # [B, C] — int8 magnitudes ≤ 127 are exact in bf16
    if scl_ref is not None:
        s = s * scl_ref[:]  # [1, C] per-row dequantization scales
    col0 = j * chunk
    gids = col0 + jax.lax.broadcasted_iota(jnp.int32, (b, s.shape[1]), 1)
    # padded catalog rows (and, when this slice starts at the global pad
    # row, local id 0) → −inf
    bad = (gids >= lim_ref[0]) | ((gids == 0) & (lim_ref[1] == 1))

    # NB: a data-dependent @pl.when gate around the merge ("skip chunks that
    # can't improve the running top-k") measured ~100× SLOWER on Mosaic —
    # the conditional region defeats the grid's DMA/compute pipelining.
    # Unconditional extraction is O(k·C) VPU work per chunk but pipelines.
    if s_ref.dtype == jnp.int32:
        # approximate modes (bf16/int8 catalogs): order-preserving int32
        # keys with each lane's id in the low bits, making rows unique —
        # extraction drops to 2 VMEM passes per round
        # (_extract_topk_packed). The extraction, not the catalog scan, is
        # the at-scale bottleneck (k·B·R VPU element-passes vs R·d HBM
        # bytes); measured at 10M items, B=256, k=10: bf16 3.26k → 4.34k
        # queries/s, int8 3.54k → 4.83k
        lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        key = (_float_key(s) & ~jnp.int32(_PACK_MASK)) | lane
        s_ref[:] = jnp.where(bad, jnp.int32(_KEY_MIN), key)
        lv, li = _extract_topk_packed(s_ref, col0, k)
    else:
        s_ref[:] = jnp.where(bad, NEG_INF, s)
        lv, li = _extract_topk_inplace(s_ref, gids, k)  # [B, k] chunk winners
    # merge the 2K candidates (tiny [B, 2k] values, loop-carried): list
    # position is the tie-break (running list first → stable order), ids
    # recovered by masked sum (no gather on Mosaic)
    cv0 = jnp.concatenate([ov_ref[:], lv], axis=1)
    ci = jnp.concatenate([oi_ref[:], li], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, 2 * k), 1)
    kcols = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def merge(t, carry):
        cv, wv, wi = carry
        m = jnp.max(cv, axis=1, keepdims=True)
        eq = cv == m
        idx = jnp.min(jnp.where(eq, pos, _BIG_COL), axis=1, keepdims=True)
        sel = pos == idx
        gid = jnp.sum(jnp.where(sel, ci, 0), axis=1, keepdims=True)
        slot = kcols == t
        wv = jnp.where(slot, m, wv)
        wi = jnp.where(slot, gid, wi)
        return jnp.where(sel, NEG_INF, cv), wv, wi

    _, mv, mi = jax.lax.fori_loop(
        0, k, merge,
        (cv0, jnp.full((b, k), NEG_INF, jnp.float32),
         jnp.zeros((b, k), jnp.int32)))
    ov_ref[:] = mv
    oi_ref[:] = mi


def catalog_topk(
    q: jnp.ndarray,
    catalog_emb: Union[jnp.ndarray, QuantizedIndex],
    k: int,
    *,
    n_items: Optional[int] = None,
    id_offset=0,
    chunk: int = 4096,
    interpret: Optional[bool] = None,
    method: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(values [B,k], global item ids [B,k]) = top-k of q · catalog_embᵀ.

    ``catalog_emb`` [R, d] are rows ``id_offset .. id_offset+R``; rows whose
    global id is 0 (pad) or ≥ ``n_items`` are excluded. ``id_offset`` may be
    a traced scalar (shard_map axis offset). Scores follow the dot decoder's
    eval geometry (``src/carca.py:362``); apply sigmoid outside if
    calibrated probabilities are needed (monotonic → same ranks).

    A bf16 ``catalog_emb`` halves the HBM scan; queries are then also
    quantized to bf16 for the MXU (fp32 accumulation) — a kernel-path
    precision choice the XLA fallback does not mirror, so near-tied ranks
    may differ between paths at bf16 (exact parity is guaranteed, and
    tested, at fp32). A ``QuantizedIndex`` quarters the scan (int8 rows +
    per-row scales applied to the score tile).

    ``method``: "stream" = the running-top-k kernel above; "tournament" =
    group-max + exact winner rerank (``_tournament_topk`` — value-exact
    ``lax.top_k`` parity for every dtype, and the fast path at scale:
    the stream kernel's k suppress rounds are its measured bottleneck);
    "auto" routes on the measured row-count crossover.
    """
    scales = None
    if isinstance(catalog_emb, QuantizedIndex):
        catalog_emb, scales = catalog_emb.qvals, catalog_emb.scales
    b, d = q.shape
    r = catalog_emb.shape[0]
    n_items = n_items if n_items is not None else id_offset + r
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if method not in ("auto", "stream", "tournament"):
        raise ValueError(f"method must be auto|stream|tournament, "
                         f"got {method!r}")
    if method == "auto":
        big = r >= (_TOURNAMENT_MIN_ROWS_BIG_K if k >= 48
                    else _TOURNAMENT_MIN_ROWS)
        method = "tournament" if big and r >= 2 * _GROUP else "stream"
    if method == "tournament":
        return _tournament_topk(q, catalog_emb, scales, k, n_items,
                                id_offset, chunk, interpret)

    # the [B, C] fp32 score scratch must fit scoped VMEM (16 MB) next to
    # the [C, d] catalog tile — cap the chunk so ~8 MB goes to the scratch
    # (B=256 keeps the full default chunk; B=1024 drops to C=1920; smaller
    # chunks just mean more grid steps over the same streamed catalog)
    if b > 16384:
        raise ValueError(
            f"query batch {b} needs a >8 MB VMEM score scratch even at the "
            f"minimum 128-column chunk; split the query batch instead")
    c_cap = max(128, (2_000_000 // max(b, 1)) // 128 * 128)
    c = min(chunk, c_cap, _round_up(r, 128))
    rp = _round_up(r, c)
    pad = rp - r
    if pad:
        catalog_emb = jnp.pad(catalog_emb, ((0, pad), (0, 0)))
        if scales is not None:
            scales = jnp.pad(scales, ((0, 0), (0, pad)))

    if k > c:
        raise ValueError(
            f"k={k} exceeds the kernel's chunk width {c} (each streamed "
            f"chunk can contribute at most {c} candidates) — lower the "
            f"requested k / exclusion slack or split the query batch")
    # the kernel works in local row space (0..R); the valid-id window and
    # the pad-row mask are shifted by id_offset (runtime SMEM scalars, so a
    # traced shard offset works). The window is clamped to this slice's
    # real row count r: on a non-last shard n_items - id_offset exceeds r,
    # and without the clamp the kernel's own zero-padded rows [r, rp) would
    # enter the top-k with fabricated score 0 under the NEXT shard's ids
    id_offset = jnp.asarray(id_offset, jnp.int32)
    lim = jnp.stack([jnp.minimum(jnp.asarray(n_items, jnp.int32) - id_offset,
                                 jnp.asarray(r, jnp.int32)),
                     (id_offset == 0).astype(jnp.int32)])
    pack = catalog_emb.dtype != jnp.float32 and c <= (1 << _PACK_BITS)
    kern = functools.partial(_kernel, k, c)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lim (2,)
        pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
    ]
    args = [lim, q, catalog_emb]
    if scales is not None:
        in_specs.append(
            pl.BlockSpec((1, c), lambda j: (0, j), memory_space=pltpu.VMEM))
        args.append(scales)
    vals, cols = pl.pallas_call(
        kern,
        grid=(rp // c,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((b, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            # score tile (suppressed in place); the packed-extraction
            # modes hold int32 ordering keys instead of raw scores
            pltpu.VMEM((b, c), jnp.int32 if pack else jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * rp * d,
            bytes_accessed=(rp * d * catalog_emb.dtype.itemsize
                            + b * d * q.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    # cols are local (0-based over this slice's rows); shift to global ids,
    # mapping fully-masked slots (vals == −inf) to the pad id 0
    return vals, jnp.where(vals > NEG_INF, cols + id_offset, 0)
