"""Analytic FLOP accounting (utils/flops.py) — hand-computed oracle."""

from carca_tpu.config import ModelConfig
from carca_tpu.utils.flops import (device_peak_flops, device_peak_hbm_bps,
                                   forward_flops_per_example,
                                   train_step_flops, train_step_hbm_bytes)


def test_forward_flops_ca_hand_computed():
    # tiny config, every term written out independently
    mc = ModelConfig(n_items=100, n_attrs=3, n_ctx=2, d=8, g=4, seq_len=5,
                     target_len=10, n_blocks=2, n_heads=2,
                     embedding="all", decoder="ca")
    L, T, d, g, a, c = 5, 10, 8, 4, 3, 2
    embed = (L + T) * (2 * (a + c) * g + 2 * (g + d) * d)
    enc = 2 * (3 * 2 * L * d * d + 2 * 2 * L * L * d + 2 * 2 * L * d * d)
    dec = 2 * T * d * d + 2 * 2 * L * d * d + 2 * 2 * T * L * d + 2 * T * d
    assert forward_flops_per_example(mc, T) == embed + enc + dec


def test_train_is_three_forwards_at_2L_targets():
    mc = ModelConfig(n_items=100, n_attrs=3, n_ctx=2, d=8, seq_len=5,
                     n_blocks=1, n_heads=2, decoder="dot")
    f = forward_flops_per_example(mc, 2 * mc.seq_len)
    assert train_step_flops(mc, batch_size=7) == 3 * 7 * f


def test_decoder_and_embedding_variants_ordered():
    base = dict(n_items=100, n_attrs=3, n_ctx=2, d=8, seq_len=5, n_blocks=1,
                n_heads=2)
    f = {dec: forward_flops_per_example(
            ModelConfig(decoder=dec, **base), 10)
         for dec in ("ca", "wdot", "dot")}
    assert f["ca"] > f["wdot"] > f["dot"] > 0
    e = {emb: forward_flops_per_example(
            ModelConfig(embedding=emb, **base), 10)
         for emb in ("all", "attrctx", "attr", "mlpid", "id")}
    assert e["all"] > e["attrctx"] > e["attr"] > e["mlpid"] > e["id"]
    # "id" has no fusion matmuls: only encoder + dot decoder remain
    L, d = base["seq_len"], base["d"]
    enc = 3 * 2 * L * d * d + 2 * 2 * L * L * d + 2 * 2 * L * d * d
    assert e["id"] == enc + 2 * 10 * d


def test_hbm_bytes_model():
    mc = ModelConfig(n_items=1_000_001, n_attrs=12, n_ctx=4, d=64, g=256,
                     seq_len=50, n_blocks=2, n_heads=2, decoder="dot")
    dense = train_step_hbm_bytes(mc, 256)
    sparse = train_step_hbm_bytes(mc, 256, sparse_items=True)
    # dense Adam streams the whole 1M-row table 8x; lazy sparse Adam
    # touches at most the batch's token rows — the dominant term at
    # catalog scale, so the gap must be the 8-pass table stream
    table_stream = 8.0 * mc.n_items * mc.d * 4
    touched = 8.0 * min(256 * 3 * 50, mc.n_items) * mc.d * 4
    assert dense - sparse == table_stream - touched
    # scales ~linearly in batch for the non-table terms
    assert train_step_hbm_bytes(mc, 512) > train_step_hbm_bytes(mc, 256)
    # modeled traffic must cover at least the raw gather+scatter bytes
    tokens = 256 * 3 * 50
    assert sparse > 3 * tokens * mc.d * 4


def test_device_peak_lookup():
    class FakeDev:
        device_kind = "TPU v5 lite"
    assert device_peak_flops(FakeDev()) == 197e12
    assert device_peak_hbm_bps(FakeDev()) == 819e9
    class Unknown:
        device_kind = "abacus"
    assert device_peak_flops(Unknown()) is None
    assert device_peak_hbm_bps(Unknown()) is None
