"""Spectrogram → ViT patches, jit-friendly with static shapes.

Reference semantics (src/caco/dataset.py:55-93):
- trim frames to a multiple of the time patch size
- reshape (T, 16, F, 16) → transpose → time-major (T*F, 256) patch sequence
- if longer than `patches_seq_len`: keep the first N patches (the
  deterministic eval policy of the torch path, eval_caco_torch.py:132-138;
  the JAX path's unseeded random subsample is a documented reference bug —
  SURVEY §4.6 — that we do not reproduce)
- else: zero-pad to `patches_seq_len` with a validity mask
- time_inds = (mask * arange) // num_freq_patches, freq_inds = ... % ...

TPU-first design: audio arrives as a fixed-size zero-padded buffer plus a
true-length scalar, so the whole wav→patches chain traces once with static
shapes and batches under `vmap`/`jit`; padding frames are masked out, which
reproduces the reference's explicit zero-padding exactly.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from cacophony_tpu.configs import FrontendConfig, PatchConfig
from cacophony_tpu.frontend.dsp import log_mel_spectrogram, num_stft_frames


def num_patches_for_samples(num_samples: int, front: FrontendConfig, patch: PatchConfig) -> int:
    """Number of valid patches a clip of `num_samples` produces (static helper)."""
    frames = num_stft_frames(num_samples, front.hop_length)
    num_freq_patches = front.num_mels // patch.freq_patch_size
    return (frames // patch.time_patch_size) * num_freq_patches


def patchify_spectrogram(
    spec: jnp.ndarray,
    num_valid_frames: jnp.ndarray,
    patch: PatchConfig,
    dtype=None,
) -> Dict[str, jnp.ndarray]:
    """spec: (F_buf, num_mels), num_valid_frames: scalar int (may be traced).

    Returns audio_patches (S, tp*fp), audio_time_inds, audio_freq_inds,
    audio_mask — all with static shapes (S = patch.patches_seq_len).

    dtype: when given (the model's compute dtype), the spectrogram is cast
    BEFORE the reshape/transpose/pad chain.  Casting commutes bit-exactly
    with those permutations, so the patches are identical to casting at the
    encoder's patch projection — but the layout copies XLA inserts here run
    at half the HBM traffic (measured ~3 ms/batch of pure copies at
    B=32/30 s in fp32 on v5e).
    """
    tp, fp, seq_len = patch.time_patch_size, patch.freq_patch_size, patch.patches_seq_len
    if dtype is not None:
        spec = spec.astype(dtype)
    f_buf, num_mels = spec.shape
    t1 = f_buf // tp
    f1 = num_mels // fp

    x = spec[: t1 * tp].reshape(t1, tp, f1, fp)
    x = x.transpose(0, 2, 1, 3).reshape(t1 * f1, tp * fp)

    if t1 * f1 >= seq_len:
        x = x[:seq_len]
    else:
        x = jnp.pad(x, ((0, seq_len - t1 * f1), (0, 0)))

    valid_patches = (num_valid_frames // tp) * f1
    positions = jnp.arange(seq_len, dtype=jnp.int32)
    mask = (positions < valid_patches).astype(jnp.int32)
    inds = positions * mask
    return {
        "audio_patches": x * mask[:, None].astype(x.dtype),
        "audio_time_inds": inds // f1,
        "audio_freq_inds": inds % f1,
        "audio_mask": mask,
    }


def wav_to_patches(
    audio_buf: jnp.ndarray,
    num_valid_samples: jnp.ndarray,
    front: FrontendConfig,
    patch: PatchConfig,
    dtype=None,
) -> Dict[str, jnp.ndarray]:
    """Full device-side frontend for one clip: fixed buffer → patch dict.

    audio_buf: (max_samples,) zero-padded waveform; num_valid_samples: scalar.
    vmap over a leading batch axis for batched use.  dtype: optional compute
    dtype for the emitted patches (see patchify_spectrogram) — the log-mel
    itself always runs fp32 (golden-pinned numerics).
    """
    spec = log_mel_spectrogram(audio_buf, front)
    num_valid_frames = num_stft_frames(num_valid_samples, front.hop_length)
    # Samples beyond num_valid_samples are zeros; frames past the valid count
    # are masked out in patchify, matching reference zero-padding.
    return patchify_spectrogram(spec, num_valid_frames, patch, dtype=dtype)
