"""Host-side audio IO: wav decode, mono mixdown, resample to 16 kHz.

Reference behavior (src/eval/eval_utils.py:6-16): soundfile read → fp32 →
channel-mean → scipy FFT resample to 16 kHz.  soundfile isn't in this
environment; decoding goes through the native C++ loader when built
(cacophony_tpu/native) with a scipy.io.wavfile fallback, and the resample
is our scipy-bit-exact `resample_fft_host`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cacophony_tpu.frontend.dsp import resample_fft_host

_PCM_SCALE = {np.dtype(np.int16): 32768.0, np.dtype(np.int32): 2147483648.0,
              np.dtype(np.uint8): 128.0}


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """→ (float32 samples (n,) or (n, ch), sample_rate)."""
    try:
        from cacophony_tpu.native import wavio  # C++ fast path

        return wavio.read_wav(path)
    except Exception:
        pass
    from scipy.io import wavfile

    sr, data = wavfile.read(path, mmap=False)
    if data.dtype in _PCM_SCALE:
        scale = _PCM_SCALE[data.dtype]
        if data.dtype == np.uint8:
            data = data.astype(np.float32) - 128.0
        data = np.asarray(data, np.float32) / scale
    else:
        data = np.asarray(data, np.float32)
    return data, int(sr)


def load_audio(path: str, expected_sr: Optional[int] = None,
               target_sr: int = 16_000) -> np.ndarray:
    """Decode + mono + resample, reference semantics (eval_utils.py:6-16).

    `expected_sr` mirrors the reference's per-dataset configured rate and,
    like the reference, TAKES PRECEDENCE over the file's header rate when
    given (the published numbers were produced that way).  A mismatch
    between the two usually means a mis-stated dataset config, so it is
    warned about rather than silently accepted.
    """
    wav, sr = read_wav(path)
    if wav.ndim > 1:
        wav = wav.mean(axis=-1)
    wav = wav.astype(np.float32)
    if expected_sr is not None and sr != expected_sr:
        import warnings

        warnings.warn(
            f"{path}: file rate {sr} != configured rate {expected_sr}; "
            "using the configured rate (reference behavior)")
    src_sr = sr if expected_sr is None else expected_sr
    if src_sr != target_sr:
        n_out = round(wav.shape[-1] * float(target_sr) / src_sr)
        wav = resample_fft_host(wav, n_out)
    return wav


def pad_to_buffer(wav: np.ndarray, buffer_samples: int) -> Tuple[np.ndarray, int]:
    """Fixed-size zero-padded buffer + true length, for the static-shape
    device frontend. Longer clips are truncated (the device patchify's
    first-N policy makes the tail unused anyway)."""
    n = min(len(wav), buffer_samples)
    buf = np.zeros(buffer_samples, np.float32)
    buf[:n] = wav[:n]
    return buf, n
