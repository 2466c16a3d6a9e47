"""Fused Pallas frontend kernel == XLA dsp/patchify path, bit-for-bit-ish.

Runs the kernel in interpret mode on CPU; the TPU-compiled kernel is
A/B'd live (see CLAUDE.md measurement notes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu.configs import FrontendConfig, PatchConfig
from cacophony_tpu.frontend import wav_to_patches
from cacophony_tpu.frontend.fused import (
    audio_rows_for,
    buffer_to_rows,
    fused_batch_wav_to_patches,
    patch_index_arrays,
)


def _xla_batch(bufs, lens, front, patch):
    return jax.vmap(lambda b, n: wav_to_patches(b, n, front, patch))(bufs, lens)


@pytest.mark.parametrize("samples,seq_len", [(160_000, 500), (32_000, 104)])
def test_fused_matches_xla_full_length(samples, seq_len):
    front = FrontendConfig()
    patch = PatchConfig(patches_seq_len=seq_len)
    rng = np.random.RandomState(0)
    bufs = jnp.asarray(rng.randn(2, samples).astype(np.float32) * 0.3)
    lens = jnp.asarray([samples, samples], jnp.int32)

    ref = _xla_batch(bufs, lens, front, patch)
    got = fused_batch_wav_to_patches(bufs, lens, front, patch, interpret=True)

    np.testing.assert_array_equal(got["audio_mask"], ref["audio_mask"])
    np.testing.assert_array_equal(got["audio_time_inds"], ref["audio_time_inds"])
    np.testing.assert_array_equal(got["audio_freq_inds"], ref["audio_freq_inds"])
    # the XLA chain's framed one-matmul STFT (r3 default) and the kernel's
    # segmented construction sum in different orders; the log amplifies the
    # fp32 rounding gap near-zero mel bins (worst seen: 1/256k at 3e-5)
    np.testing.assert_allclose(got["audio_patches"], ref["audio_patches"],
                               atol=1e-4, rtol=1e-6)


def test_fused_masks_short_clips_exactly():
    """Clips shorter than the buffer: padding region must be EXACT zeros
    (not log(eps) values) and the mask must follow ceil(len/hop)//16*8."""
    front = FrontendConfig()
    patch = PatchConfig(patches_seq_len=104)
    rng = np.random.RandomState(1)
    bufs = np.zeros((3, 32_000), np.float32)
    lens = np.asarray([32_000, 17_003, 0], np.int32)
    for i, n in enumerate(lens):
        bufs[i, :n] = rng.randn(n) * 0.3
    bufs, lens = jnp.asarray(bufs), jnp.asarray(lens)

    ref = _xla_batch(bufs, lens, front, patch)
    got = fused_batch_wav_to_patches(bufs, lens, front, patch, interpret=True)

    np.testing.assert_array_equal(got["audio_mask"], ref["audio_mask"])
    np.testing.assert_allclose(got["audio_patches"], ref["audio_patches"],
                               atol=2e-5, rtol=1e-6)
    # masked rows are exact zeros
    m = np.asarray(got["audio_mask"][1]).astype(bool)
    assert np.all(np.asarray(got["audio_patches"][1])[~m] == 0.0)
    assert np.asarray(got["audio_mask"][2]).sum() == 0


def test_fast_dft_within_golden_tolerance():
    """bf16x3 DFT (3-pass) stays within the frontend golden tolerance
    (2e-4 on log-mel) of the exact path."""
    from cacophony_tpu.frontend.fused import buffer_to_rows, fused_log_mel

    front = FrontendConfig()
    rng = np.random.RandomState(3)
    bufs = jnp.asarray(rng.randn(2, 32_000).astype(np.float32) * 0.3)
    rows = buffer_to_rows(bufs, 200, front)
    exact = fused_log_mel(rows, front, 200, interpret=True, fast_dft=False)
    fast = fused_log_mel(rows, front, 200, interpret=True, fast_dft=True)
    np.testing.assert_allclose(fast, exact, atol=2e-4)


def test_buffer_to_rows_layout():
    front = FrontendConfig()
    bufs = jnp.arange(2 * 1600, dtype=jnp.float32).reshape(2, 1600)
    num_frames = 10
    rows = buffer_to_rows(bufs, num_frames, front)
    assert rows.shape == (2, audio_rows_for(num_frames, front), front.hop_length)
    # row f starts at sample f*hop
    np.testing.assert_array_equal(np.asarray(rows[0, 3]),
                                  np.asarray(bufs[0, 3 * 160:4 * 160]))
    # padding rows are zero
    assert float(jnp.abs(rows[0, 10:]).sum()) == 0.0


def test_patch_index_arrays_match_patchify():
    front = FrontendConfig()
    patch = PatchConfig(patches_seq_len=104)
    lens = jnp.asarray([32_000, 17_003, 160, 0], jnp.int32)
    bufs = jnp.zeros((4, 32_000), jnp.float32)
    ref = _xla_batch(bufs, lens, front, patch)
    got = patch_index_arrays(lens, front, patch)
    for k in ("audio_time_inds", "audio_freq_inds", "audio_mask"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_long_buffer_falls_back_to_xla():
    """30 s buffers (3000 frames) bust the kernel VMEM budget (measured
    23.3M > 16M on v5e) and must route through the XLA chain unchanged."""
    from cacophony_tpu.frontend.fused import fits_vmem

    front = FrontendConfig()
    assert fits_vmem(1000, front)       # 10 s budget
    assert not fits_vmem(3000, front)   # 30 s budget

    patch = PatchConfig(patches_seq_len=120)
    rng = np.random.RandomState(5)
    bufs = jnp.asarray(rng.randn(2, 480_000).astype(np.float32) * 0.3)
    lens = jnp.asarray([480_000, 250_000], jnp.int32)
    ref = _xla_batch(bufs, lens, front, patch)
    got = fused_batch_wav_to_patches(bufs, lens, front, patch, interpret=True)
    np.testing.assert_array_equal(got["audio_mask"], ref["audio_mask"])
    np.testing.assert_allclose(got["audio_patches"], ref["audio_patches"],
                               atol=2e-5, rtol=1e-6)
