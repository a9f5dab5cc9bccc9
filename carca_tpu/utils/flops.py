"""Analytic matmul-FLOP accounting for MFU reporting.

The reference publishes no utilization numbers (SURVEY.md §6) and judging
"fast" against its torch-CPU loop proves nothing about chip utilization.
``bench.py`` divides the analytic model FLOPs/step by measured step time
and the chip's peak to emit an honest MFU alongside raw throughput.

Only matmul FLOPs are counted (the MFU convention): embedding-fusion
linears, attention projections, score/value matmuls, FFN, decoder. Table
gathers, masking, softmax, dropout, the negative sampler's sorts, and the
optimizer are excluded — at CARCA scale (d=64–128) those are exactly the
memory-bound parts MFU is meant to expose as the gap to 100%.

Peaks are the bf16 MXU peak. On TPU, f32 ``jnp.dot`` under the package's
DEFAULT precision also multiplies in bf16 (f32 accumulate), so the bf16
peak is the correct denominator for both compute dtypes used here.
"""

from __future__ import annotations

from carca_tpu.config import ModelConfig

# bf16 (or int8-capable chips' bf16) peak matmul FLOP/s per chip.
# Sources: public TPU spec sheets; keys are jax device_kind strings.
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # Trillium
    "TPU v6e": 918e12,
}


def _embed_flops_per_token(mc: ModelConfig) -> float:
    """Matmul FLOPs to fuse one (id, attrs, ctx) token to d dims
    (``models/embeddings.py``; reference formulas ``src/carca.py:66-198``)."""
    a, c, g, d = mc.n_attrs, mc.n_ctx, mc.g, mc.d
    if mc.embedding == "all":
        return 2.0 * (a + c) * g + 2.0 * (g + d) * d
    if mc.embedding == "attrctx":
        return 2.0 * (a + c) * g + 2.0 * g * d
    if mc.embedding == "attr":
        return 2.0 * a * g + 2.0 * g * d
    if mc.embedding == "mlpid":
        return 2.0 * g * d
    return 0.0  # "id": pure table gather


def forward_flops_per_example(mc: ModelConfig, n_targets: int) -> float:
    """Matmul FLOPs of one CARCA forward pass for one example with
    ``n_targets`` candidate tokens (train: 2L, eval: target_len+1).

    Mirrors the compute graph of ``models/carca.py::carca_apply``:
    embed L profile + n_targets target tokens, ``n_blocks`` encoder
    blocks over the profile, decoder over the candidates.
    """
    L, d, T = mc.seq_len, mc.d, n_targets
    f = (L + T) * _embed_flops_per_token(mc)
    # encoder block: Q/K/V projections, L x L scores, weighted values,
    # two d->d FFN convs (models/encoder.py; src/carca.py:297-318)
    per_block = 3 * 2.0 * L * d * d + 2 * 2.0 * L * L * d + 2 * 2.0 * L * d * d
    f += mc.n_blocks * per_block
    if mc.decoder == "ca":
        # cross-attention: Wq over T targets, Wk/Wv over L profile,
        # T x L scores + values, final d->1 linear (src/carca.py:338-349)
        f += 2.0 * T * d * d + 2 * 2.0 * L * d * d
        f += 2 * 2.0 * T * L * d + 2.0 * T * d
    elif mc.decoder == "wdot":
        # closed-form decayed profile mix: [L, L] @ [L, d] per example
        f += 2.0 * L * L * d + 2.0 * T * d
    else:  # dot: elementwise p.o reduction
        f += 2.0 * T * d
    return f


def train_step_flops(mc: ModelConfig, batch_size: int) -> float:
    """Matmul FLOPs of one optimizer step (fwd + bwd) over a batch.

    Backward of a matmul costs 2x its forward (grads w.r.t. both inputs),
    the standard 3x-forward accounting.
    """
    return 3.0 * batch_size * forward_flops_per_example(mc, 2 * mc.seq_len)


def device_peak_flops(device) -> float | None:
    """bf16 peak for a jax device, or None when unknown (CPU, new chips)."""
    return PEAK_FLOPS.get(getattr(device, "device_kind", ""))


# HBM peak bandwidth per chip, bytes/s. Same public spec sheets as
# PEAK_FLOPS; keys are jax device_kind strings.
PEAK_HBM_BPS = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,  # v5p
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,  # Trillium
    "TPU v6e": 1640e9,
}


def device_peak_hbm_bps(device) -> float | None:
    """HBM peak bytes/s for a jax device, or None when unknown."""
    return PEAK_HBM_BPS.get(getattr(device, "device_kind", ""))


def train_step_hbm_bytes(mc: ModelConfig, batch_size: int,
                         sparse_items: bool = False) -> float:
    """Modeled HBM bytes of one optimizer step (companion to
    ``train_step_flops`` for the bandwidth roofline).

    Counts the traffic classes a CARCA train step cannot avoid at the
    HLO level — optimizer/gradient streams over the parameter tables,
    embedding-table gathers + backward scatter-adds, batch tensors, and
    forward intermediates written to HBM and re-read by the backward
    pass (no remat). Elementwise chains XLA fuses (bias adds, masks,
    activations, dropout) are NOT counted as extra round-trips, so this
    is a best-case model: ``hbm_gbps`` computed from it understates the
    chip's achieved bytes when fusion falls short, and the ratio to the
    HBM peak is a lower bound on how bandwidth-bound the step is.

    Two caveats it deliberately does not model (DESIGN §13): random-row
    table gathers/scatters move (8, 128) tiles per row on TPU, so their
    *achieved* bytes can exceed the logical row bytes counted here by
    the tile/row ratio; and unique-row scatters sit at a per-row RMW
    floor that is latency-, not bytes-, limited (CLAUDE.md traps).
    """
    B, L, d, g = batch_size, mc.seq_len, mc.d, mc.g
    T = 2 * L  # train candidates: L positives + L negatives
    a, c = mc.n_attrs, mc.n_ctx
    s = 4  # params/tables/activations are f32 on the hot path; the
    #        bf16 compute_dtype casts happen inside fused matmuls
    tokens = B * (L + T)

    # parameter bytes: items table + attr/ctx fusion MLPs + encoder +
    # decoder (mirrors models/*_init shapes)
    p_table = mc.n_items * d * s
    p_fuse = ((a + c) * g + g + (g + d) * d + d) * s  # fc1 + fc2 (+biases)
    p_enc = mc.n_blocks * (3 * d * d + 2 * d * d + 4 * d) * s
    p_dec = (3 * d * d + d) * s if mc.decoder == "ca" else 0
    p_rest = p_fuse + p_enc + p_dec

    # optimizer stream: bwd writes grads (1), Adam reads g+p+m+v (4) and
    # writes p+m+v (3) = 8 passes over every parameter byte. Lazy
    # row-sparse Adam (train/sparse_adam.py) touches only the gathered
    # rows of the items table; `tokens` is the (duplicate-counting)
    # upper bound on touched rows.
    touched = min(tokens, mc.n_items) * d * s
    opt = 8.0 * ((touched if sparse_items else p_table) + p_rest)

    # table gathers: every token reads its item row + attrs row (+ pos
    # row when encoded); backward scatter-adds d-dim grads (read+write)
    gather = tokens * (d + a) * s
    scatter = 2.0 * tokens * d * s

    # batch tensors: ids, labels, per-event ctx (device pipeline keeps
    # them in HBM between assembly and the step)
    batch_io = tokens * (4 + 4 + c * s)

    # forward intermediates (write fwd + read bwd = 2 passes each),
    # mirroring carca_apply: fused token embeddings [tokens, d] and the
    # g-dim attr/ctx hidden, encoder per block (Q,K,V, scores, softmax,
    # attn out, 2 FFN), decoder (ca: Q,K,V, scores, softmax, out).
    acts = tokens * (g + d)
    acts += mc.n_blocks * (3 * B * L * d + 2 * B * L * L + 2 * B * L * d
                           + 2 * B * L * d)
    if mc.decoder == "ca":
        acts += B * T * d + 2 * B * L * d + 2 * B * T * L + B * T * d
    else:
        acts += B * T * d  # profile mix / score intermediates
    acts_bytes = 2.0 * acts * s

    return opt + gather + scatter + batch_io + acts_bytes
