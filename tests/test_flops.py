"""MFU accounting sanity: analytic matmul FLOPs vs XLA's own cost analysis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cacophony_tpu.configs import (
    AudioEncoderConfig,
    CacoConfig,
    FrontendConfig,
    PatchConfig,
    TextConfig,
)
from cacophony_tpu.utils.flops import (
    device_peak_flops,
    encoder_matmul_flops,
    pipeline_matmul_flops,
)


def test_device_peak_lookup():
    assert device_peak_flops("TPU v5e") == 197e12
    assert device_peak_flops("TPU v5 lite") == 197e12
    assert device_peak_flops("TPU v4") == 275e12
    assert device_peak_flops("cpu") is None


def test_encoder_flops_match_xla_cost_analysis():
    """Analytic count within 5% of XLA's flop estimate for the encoder-only
    forward (XLA counts the same matmuls plus small elementwise terms).
    num_layers=1 because XLA's cost analysis counts a lax.scan body once."""
    cfg = AudioEncoderConfig(hidden_size=64, num_layers=1, num_heads=2,
                             intermediate_size=128, patch_size=256,
                             num_freq_patches=8,
                             flash_attention=False)  # XLA counts einsum ops
    seq, b = 64, 2
    from cacophony_tpu.models.audio import audio_encoder_apply, audio_encoder_init

    params = audio_encoder_init(jax.random.PRNGKey(0), cfg)
    patches = jnp.zeros((b, seq, cfg.patch_size))
    inds = jnp.zeros((b, seq), jnp.int32)
    mask = jnp.ones((b, seq), jnp.int32)

    fn = jax.jit(lambda p, x: audio_encoder_apply(p, cfg, x, inds, inds, mask))
    cost = fn.lower(params, patches).compile().cost_analysis()
    if not cost or "flops" not in cost:
        pytest.skip("backend reports no cost analysis")
    analytic = b * encoder_matmul_flops(cfg, seq)
    assert analytic <= cost["flops"] <= analytic * 1.05


def test_pipeline_flops_plausible():
    """85M-encoder pipeline on a 10-s clip is ~95 GFLOP (order-of-magnitude
    pin so a unit slip in the accounting fails loudly)."""
    cfg = CacoConfig()
    total = pipeline_matmul_flops(cfg, FrontendConfig(),
                                  PatchConfig(patches_seq_len=500), 160_000)
    assert 80e9 < total < 120e9
    # Frontend is a rounding error vs the encoder.
    enc = encoder_matmul_flops(cfg.audio, 500)
    assert enc / total > 0.95


def test_bench_stored_baseline_roundtrip(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "BASELINE_FILE_LOCAL",
                        str(tmp_path / "cache" / "b.json"))
    with pytest.raises(FileNotFoundError):
        bench._load_stored_baseline()
    # fresh measurements land in the gitignored local path and win over
    # the committed copy on read
    bench._store_baseline(0.781)
    val, source = bench._load_stored_baseline()
    assert val == 0.781
    assert source.startswith("stored:")
    import json

    with open(tmp_path / "b.json", "w") as f:
        json.dump({"cpu_fp32_b1_clips_per_s": 0.5, "measured": "x"}, f)
    val, _ = bench._load_stored_baseline()
    assert val == 0.781  # local measurement preferred
