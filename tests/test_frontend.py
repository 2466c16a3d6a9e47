"""Golden-vector tests for the DSP frontend.

The mel frontend is the documented parity killer (the reference's own torch
port reached only ~0.993 cosine; eval_caco_torch.py:51-62).  tfio's ops are
thin wrappers over tf.signal (spectrogram = tf.signal.stft(pad_end=True),
melscale = tf.signal.linear_to_mel_weight_matrix), so we test bit-parity
against tf.signal directly when TensorFlow is available.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu.configs import FrontendConfig, PatchConfig
from cacophony_tpu.frontend import (
    linear_to_mel_matrix,
    log_mel_spectrogram,
    num_stft_frames,
    patchify_spectrogram,
    resample_fft,
    stft_magnitude,
    wav_to_patches,
)

tf = pytest.importorskip("tensorflow", reason="tf.signal golden reference unavailable")

CFG = FrontendConfig()


def _tf_logmel(audio: np.ndarray) -> np.ndarray:
    """Reference frontend: exact tfio.audio.spectrogram+melscale composition
    (caco_eval_utils.py:21-23), expressed via the tf.signal ops tfio wraps."""
    spec = tf.abs(
        tf.signal.stft(
            audio, frame_length=CFG.window_length, frame_step=CFG.hop_length,
            fft_length=CFG.fft_size, window_fn=tf.signal.hann_window, pad_end=True,
        )
    )
    mel_matrix = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=CFG.num_mels, num_spectrogram_bins=CFG.num_spectrogram_bins,
        sample_rate=CFG.sample_rate, lower_edge_hertz=0.0,
        upper_edge_hertz=CFG.sample_rate / 2,
    )
    mel = tf.tensordot(spec, mel_matrix, 1)
    return (tf.math.log(mel + 1e-5) * 0.2 + 0.9).numpy()


@pytest.mark.parametrize("n_samples", [16000, 160000, 15999, 16001, 4321])
def test_logmel_matches_tf(rng, n_samples):
    audio = rng.randn(n_samples).astype(np.float32) * 0.1
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio), CFG))
    theirs = _tf_logmel(audio)
    assert ours.shape == theirs.shape == (-(-n_samples // CFG.hop_length), CFG.num_mels)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_mel_matrix_matches_tf():
    ours = linear_to_mel_matrix(CFG)
    theirs = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=CFG.num_mels, num_spectrogram_bins=CFG.num_spectrogram_bins,
        sample_rate=CFG.sample_rate, lower_edge_hertz=0.0,
        upper_edge_hertz=CFG.sample_rate / 2,
    ).numpy()
    # TF builds the matrix in fp32; ours is fp64-then-cast, so agreement is
    # limited by TF's own rounding (~1.3e-5).
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_stft_matches_tf(rng):
    audio = rng.randn(8000).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(audio), CFG))
    theirs = tf.abs(
        tf.signal.stft(audio, 400, 160, fft_length=512,
                       window_fn=tf.signal.hann_window, pad_end=True)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("n_in,n_out", [(44100, 16000), (48000, 16000), (22050, 16000),
                                        (16000, 48000), (1000, 1001), (1001, 500)])
def test_resample_matches_scipy(rng, n_in, n_out):
    import scipy.signal
    x = rng.randn(n_in).astype(np.float32)
    ours = np.asarray(resample_fft(jnp.asarray(x), n_out))
    theirs = scipy.signal.resample(x, n_out)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def _reference_patchify(spec: np.ndarray, seq_len: int):
    """Independent numpy transcription of dataset.py:55-93 semantics
    (deterministic first-N policy for the long case)."""
    tp = fp = 16
    t1, f1 = spec.shape[0] // tp, spec.shape[1] // fp
    spec = spec[: t1 * tp]
    x = spec.reshape(t1, tp, f1, fp).transpose(0, 2, 1, 3).reshape(t1 * f1, tp * fp)
    full = t1 * f1
    if full > seq_len:
        keep = np.arange(seq_len)
        x = x[keep]
        mask = np.ones(seq_len, np.int32)
        time_inds, freq_inds = keep // f1, keep % f1
    else:
        mask = (np.arange(seq_len) < full).astype(np.int32)
        time_inds = (mask * np.arange(seq_len)) // f1
        freq_inds = (mask * np.arange(seq_len)) % f1
        x = np.pad(x, [[0, seq_len - full], [0, 0]])
    return x, time_inds, freq_inds, mask


@pytest.mark.parametrize("n_frames,seq_len", [(1000, 500), (100, 500), (96, 48), (170, 64)])
def test_patchify_matches_reference_semantics(rng, n_frames, seq_len):
    spec = rng.randn(n_frames, 128).astype(np.float32)
    patch = PatchConfig(patches_seq_len=seq_len)
    out = patchify_spectrogram(jnp.asarray(spec), jnp.int32(n_frames), patch)
    x, ti, fi, m = _reference_patchify(spec, seq_len)
    np.testing.assert_allclose(np.asarray(out["audio_patches"]), x, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["audio_time_inds"]), ti)
    np.testing.assert_array_equal(np.asarray(out["audio_freq_inds"]), fi)
    np.testing.assert_array_equal(np.asarray(out["audio_mask"]), m)


def test_wav_to_patches_end_to_end_matches_tf(rng):
    """Fixed 10-s buffer with a shorter true clip must equal the reference
    host pipeline run on the unpadded clip."""
    true_len = 123_456
    buf_len = 160_000
    audio = rng.randn(true_len).astype(np.float32) * 0.1
    buf = np.zeros(buf_len, np.float32)
    buf[:true_len] = audio

    patch = PatchConfig(patches_seq_len=500)
    out = jax.jit(
        lambda b, n: wav_to_patches(b, n, CFG, patch), static_argnums=()
    )(jnp.asarray(buf), jnp.int32(true_len))

    ref_spec = _tf_logmel(audio)
    x, ti, fi, m = _reference_patchify(ref_spec, 500)
    np.testing.assert_array_equal(np.asarray(out["audio_mask"]), m)
    np.testing.assert_array_equal(np.asarray(out["audio_time_inds"]), ti)
    np.testing.assert_array_equal(np.asarray(out["audio_freq_inds"]), fi)
    np.testing.assert_allclose(np.asarray(out["audio_patches"]), x, atol=5e-4, rtol=1e-4)
