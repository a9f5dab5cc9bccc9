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
