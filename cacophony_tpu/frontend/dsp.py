"""Device-side DSP frontend: STFT → mel → log, as MXU-friendly matmuls.

The reference computes this on the host with TensorFlow kernels
(tfio.audio.spectrogram + tfio.audio.melscale, reference
src/caco/caco_eval_utils.py:21-23), serialized with device compute.  Here the
whole chain runs on the TPU under `jit` as three matmuls (windowed real DFT,
imaginary DFT, mel projection) that XLA fuses and tiles onto the MXU — no
host round-trip, no FFT op.

Exact tfio semantics reproduced (the known parity killer — the reference's
own torch port only reached ~0.993 embedding cosine because it got these
wrong; src/eval/eval_caco_torch.py:51-62):

- frames = ceil(len / hop)   (tf.signal.stft(..., pad_end=True))
- each frame is `window_length` samples starting at t*hop, zero-padded at the
  END to fft_size (torch center-pads the window instead — a 56-sample shift)
- periodic Hann window of window_length
- magnitude (power=1) spectrum
- TF mel matrix: HTK mel scale, triangles computed in MEL space (torchaudio
  computes them in Hz), DC bin zeroed, no normalization
- log(mel + 1e-5) * 0.2 + 0.9
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cacophony_tpu.configs import FrontendConfig


# Above this static frame count the framed-gather STFT formulation is
# replaced by the segmented reshape-only form (see stft_magnitude): the
# gather fuses cleanly at 10-s clips (1000 frames) but XLA's lowering
# collapses at 30-s clips (3000 frames).  Measured boundary unknown
# between those two points; 2000 splits it conservatively.
_FRAMED_MAX_FRAMES = 2000


def num_stft_frames(num_samples, hop_length: int):
    """tfio frame count: ceil(len / hop). Works on ints and traced scalars."""
    return -(-num_samples // hop_length)


def hann_window_periodic(window_length: int) -> np.ndarray:
    """Periodic Hann window (tf.signal.hann_window / torch.hann_window default)."""
    n = np.arange(window_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)).astype(np.float32)


def _hertz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def linear_to_mel_matrix(cfg: FrontendConfig) -> np.ndarray:
    """TF-semantics mel filterbank, shape (num_spectrogram_bins, num_mels).

    Matches tf.signal.linear_to_mel_weight_matrix (which tfio.audio.melscale
    wraps): HTK mel scale, band edges linearly spaced in mel, triangular
    weights computed in mel space, the DC spectrogram bin dropped (zero row),
    no area normalization.
    """
    nbins = cfg.num_spectrogram_bins
    nyquist = cfg.sample_rate / 2.0
    # Spectrogram bin center frequencies, DC dropped.
    linear_freqs = np.linspace(0.0, nyquist, nbins)[1:]
    spec_mel = _hertz_to_mel(linear_freqs)[:, None]

    band_edges = np.linspace(_hertz_to_mel(cfg.mel_fmin), _hertz_to_mel(cfg.fmax), cfg.num_mels + 2)
    lower, center, upper = band_edges[:-2], band_edges[1:-1], band_edges[2:]

    lower_slopes = (spec_mel - lower) / (center - lower)
    upper_slopes = (upper - spec_mel) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    # Re-attach the zeroed DC row.
    weights = np.pad(weights, [[1, 0], [0, 0]])
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _windowed_dft_matrices(window_length: int, fft_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices with the Hann window and end-zero-padding folded in.

    For a frame x of `window_length` samples, the end-padded windowed rDFT is
        X[k] = sum_n w[n] x[n] exp(-2πi n k / fft_size),   n < window_length
    so |X| = sqrt((x @ Cr)^2 + (x @ Ci)^2) with Cr/Ci of shape
    (window_length, fft_size//2+1).  Two matmuls instead of an FFT — small
    K (400) and large frame counts map straight onto the MXU.
    """
    nbins = fft_size // 2 + 1
    n = np.arange(window_length, dtype=np.float64)[:, None]
    k = np.arange(nbins, dtype=np.float64)[None, :]
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length))
    angle = -2.0 * np.pi * n * k / fft_size
    cr = (w * np.cos(angle)).astype(np.float32)
    ci = (w * np.sin(angle)).astype(np.float32)
    return cr, ci


def stft_magnitude(audio: jnp.ndarray, cfg: FrontendConfig, *,
                   exact: bool = False) -> jnp.ndarray:
    """Magnitude STFT with tfio semantics. audio: (num_samples,) → (F, nbins).

    Default (fast) form: materialize the overlapped (F, win) frames with a
    gather and run ONE (F, win) @ (win, 2·nbins) matmul against the
    re|im-concatenated windowed-DFT matrix at Precision.HIGH (3-pass
    bf16 on the MXU).  Measured on v5e (same-session interleaved A/B,
    B=128 10-s pipeline): 1469 → 1497 clips/s (+1.9%) vs the previous
    6-pass-fp32 segmented form, log-mel max abs diff 3.0e-4, embedding
    cosine ≥ 0.999999.  One-pass bf16 (DEFAULT precision) gains only a
    further +0.5% but costs 6.8e-2 log-mel error — rejected: the log
    amplifies error and the DSP output is numerically load-bearing.

    Long clips (> _FRAMED_MAX_FRAMES frames, static at trace time) keep
    the segmented no-gather fp32 formulation instead: at 30 s under
    vmap(B=32) XLA lowers the (F, win) gather to a transposed
    f32[F·win, B] fusion plus a while-loop dynamic-update-slice chain —
    ~20 ms/batch, a 19% regression (xplane-measured) — while at 10 s the
    gather fuses cleanly into the matmul read.  The segmented form is
    Σ_k A[f+k] @ C[k·hop:(k+1)·hop] over A = padded.reshape(-1, hop)
    (frame f covers [f·hop, f·hop+win), split into hop-aligned chunks;
    n_seg = ⌈win/hop⌉ = 3 matmuls), pure reshapes — no gather at any
    length.  It stays at fp32 HIGHEST: 3-pass-bf16 there compounds to
    1.1e-3 log-mel error (three separately rounded partial sums) and
    measured only +0.5% at 30 s (359.0 vs 357.1 clips/s, within noise) —
    not worth the precision on the reference's headline eval shape.

    exact=True forces the segmented fp32 formulation at any length —
    golden regeneration and diagnostics.
    """
    hop, win = cfg.hop_length, cfg.window_length
    num_frames = num_stft_frames(audio.shape[-1], cfg.hop_length)
    cr, ci = _windowed_dft_matrices(win, cfg.fft_size)
    nb = cr.shape[1]

    if exact or num_frames > _FRAMED_MAX_FRAMES:
        prec = jax.lax.Precision.HIGHEST
        n_seg = -(-win // hop)
        total = (num_frames + n_seg) * hop
        x = audio.astype(jnp.float32)
        x = jnp.pad(x, (0, total - x.shape[-1]))
        a = x.reshape(num_frames + n_seg, hop)
        re = im = 0.0
        for k in range(n_seg):
            lo, hi = k * hop, min((k + 1) * hop, win)
            seg = a[k:num_frames + k, : hi - lo]
            re = re + jnp.dot(seg, jnp.asarray(cr[lo:hi]), precision=prec)
            im = im + jnp.dot(seg, jnp.asarray(ci[lo:hi]), precision=prec)
        return jnp.sqrt(re * re + im * im)

    total = (num_frames - 1) * hop + win
    x = audio.astype(jnp.float32)
    x = jnp.pad(x, (0, max(0, total - x.shape[-1])))
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(win)[None, :]
    frames = x[idx]  # (F, win); XLA fuses the gather into the matmul read
    c = jnp.asarray(np.concatenate([cr, ci], axis=1))  # (win, 2·nbins)
    acc = jnp.dot(frames, c, precision=jax.lax.Precision.HIGH)
    re, im = acc[:, :nb], acc[:, nb:]
    return jnp.sqrt(re * re + im * im)


def log_mel_spectrogram(audio: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Full frontend: audio (num_samples,) → log-mel (num_frames, num_mels).

    Matches reference compute_mel_spec_audiomae (caco_eval_utils.py:12-24).
    """
    spec = stft_magnitude(audio, cfg)
    mel = jnp.dot(spec, jnp.asarray(linear_to_mel_matrix(cfg)),
                  precision=jax.lax.Precision.HIGHEST)
    return jnp.log(mel + cfg.log_offset) * cfg.log_scale + cfg.log_bias


def resample_fft_host(audio: np.ndarray, num_out: int) -> np.ndarray:
    """Host-side FFT resample, bit-matching scipy.signal.resample (real input).

    This is the loader path (reference: scipy resample in eval_utils.py:14).
    Resampling arbitrary-length clips is IO-adjacent host work: XLA:TPU
    lowers non-power-of-2 FFTs to dense DFT matmuls (a 340k-sample clip
    would allocate a 460 GB matrix — observed), so the exact-FFT variant
    must NOT run on the TPU; `resample_fft` below is for CPU meshes/tests.
    """
    num_in = audio.shape[-1]
    if num_in == num_out:
        return audio
    x = np.fft.rfft(audio.astype(np.float32))
    nbins_out = num_out // 2 + 1
    n_keep = min(num_in, num_out)
    if num_out < num_in:
        y = x[..., :nbins_out].copy()
        if n_keep % 2 == 0:
            y[..., n_keep // 2] *= 2.0
    else:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, nbins_out - x.shape[-1])]
        y = np.pad(x, pad)
        if n_keep % 2 == 0:
            y[..., n_keep // 2] *= 0.5
    out = np.fft.irfft(y, n=num_out)
    return (out * (num_out / num_in)).astype(np.float32)


def resample_fft(audio: jnp.ndarray, num_out: int) -> jnp.ndarray:
    """FFT-domain resample matching scipy.signal.resample for real input.

    jnp variant of `resample_fft_host` for CPU backends and tests.  Do not
    trace onto a TPU with large non-power-of-2 lengths (see note above).
    Static shapes only (in/out lengths fixed at trace time).
    """
    num_in = audio.shape[-1]
    if num_in == num_out:
        return audio
    x = jnp.fft.rfft(audio.astype(jnp.float32))
    nbins_out = num_out // 2 + 1
    n_keep = min(num_in, num_out)

    if num_out < num_in:  # downsample: truncate spectrum
        y = x[..., :nbins_out]
        if n_keep % 2 == 0:
            # Fold energy from the symmetric negative-frequency component
            y = y.at[..., n_keep // 2].multiply(2.0)
    else:  # upsample: zero-pad spectrum
        pad = [(0, 0)] * (x.ndim - 1) + [(0, nbins_out - x.shape[-1])]
        y = jnp.pad(x, pad)
        if n_keep % 2 == 0:
            # Split the Nyquist bin between positive and negative halves
            y = y.at[..., n_keep // 2].multiply(0.5)
    out = jnp.fft.irfft(y, n=num_out)
    return out * (num_out / num_in)
