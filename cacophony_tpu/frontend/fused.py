"""Fused Pallas frontend: waveform → log-mel spectrogram in ONE kernel.

The XLA path (dsp.py) materializes the DSP intermediates in HBM; this
kernel keeps the whole chain in VMEM.  OPT-IN, not the default: the r3
framed one-matmul dsp.stft_magnitude (Precision.HIGH) measured FASTER
end-to-end than this kernel (1497 vs 1454 clips/s exact / 1488 fast-DFT,
same-session B=128 10-s A/B) — the MXU prefers one big bf16x3 matmul over
the in-VMEM segmented fp32 construction.  Kept for its memory profile
(HBM traffic = read-audio + write-logmel only) and as the shard_map
frontend demonstration.  Per grid step one clip's hop-major audio block
streams in,
the windowed real DFT runs as segmented matmuls against lane-padded
cos/sin matrices, magnitude → mel → log happen in registers, and only the
(F, num_mels) log-mel block streams out — HBM traffic drops to
read-audio + write-logmel.  (F, 128) is a perfectly tiled layout; the
patchify transpose stays in XLA (Mosaic rejects the lane-splitting
(F,128)→(62,16,8,16) reshape — "unsupported shape cast" — and XLA handles
the transpose in one fused pass over the already-small log-mel.)

Semantics are bit-compatible with dsp.log_mel_spectrogram (tfio frame
rule, periodic Hann folded into the DFT matrices, TF mel matrix, log
scaling — reference src/caco/caco_eval_utils.py:12-24); parity is pinned
by tests/test_fused_frontend.py against the XLA path, including the
patch-level mask/zeroing behavior of dataset.py:55-93.

Layout contract: audio arrives as (B, R, hop) — hop-major rows, R ≥
num_frames + n_seg — which the host writes directly (a free reshape of the
zero-padded buffer).  Frame f covers rows f..f+n_seg-1, so the overlapped
framing never materializes: it's n_seg static-sliced matmuls
(dsp.stft_magnitude's construction, moved into VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cacophony_tpu.configs import FrontendConfig, PatchConfig
from cacophony_tpu.frontend.dsp import _windowed_dft_matrices, linear_to_mel_matrix
from cacophony_tpu.frontend.patchify import patchify_spectrogram


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _padded_matrices(front: FrontendConfig):
    """DFT (cos/sin, Hann folded in, re|im concatenated) and mel matrices,
    lane-padded to 128 multiples.  Padded spectrogram bins are zero
    columns → zero magnitude → multiplied by zero mel rows: exact."""
    cr, ci = _windowed_dft_matrices(front.window_length, front.fft_size)
    mel = linear_to_mel_matrix(front)
    nbins = cr.shape[1]
    nbins_pad = _round_up(nbins, 128)
    c = np.concatenate([
        np.pad(cr, [[0, 0], [0, nbins_pad - nbins]]),
        np.pad(ci, [[0, 0], [0, nbins_pad - nbins]]),
    ], axis=1)  # (win, 2*nbins_pad): one matmul for re and im
    mel = np.pad(mel, [[0, nbins_pad - nbins], [0, 0]])
    return c, mel, nbins_pad


def _split_bf16(x: np.ndarray):
    """fp32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~16 mantissa bits."""
    hi = x.astype(np.float32).astype(jnp.bfloat16)
    lo = (x - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def audio_rows_for(num_frames: int, front: FrontendConfig) -> int:
    """Rows of the (R, hop) hop-major audio layout the kernel consumes."""
    n_seg = -(-front.window_length // front.hop_length)
    return num_frames + n_seg


# Per-grid-step VMEM budget; pipelined blocks double-buffer (count twice).
# Shared with the attention kernels so device-generation retuning happens
# in one place.
from cacophony_tpu.ops import encoder_attention as _enc_attn  # noqa: E402


def fits_vmem(num_frames: int, front: FrontendConfig) -> bool:
    """Whether one clip's DSP chain fits on-chip: audio rows + fp32 re|im
    accumulator + magnitude + log-mel output.  A 10 s clip (1000 frames)
    fits comfortably; a 30 s clip (3000 frames) does NOT (measured 23.3M >
    16M) — callers fall back to the XLA chain there."""
    rows = audio_rows_for(num_frames, front)
    nbins_pad = _round_up(front.num_spectrogram_bins, 128)
    blocks = (rows * front.hop_length * 4          # audio in
              + num_frames * front.num_mels * 4)   # log-mel out
    scratch = num_frames * 2 * nbins_pad * 4 * 2   # acc + magnitude
    # Read the budget through the module so runtime retuning of
    # encoder_attention.VMEM_BUDGET_BYTES reaches both kernels.
    return 2 * blocks + scratch <= _enc_attn.VMEM_BUDGET_BYTES


def buffer_to_rows(bufs: jnp.ndarray, num_frames: int, front: FrontendConfig):
    """(B, samples) zero-padded buffers → (B, R, hop) hop-major rows.

    Pure pad+reshape; prefer writing host buffers in this shape directly
    so this costs nothing."""
    rows = audio_rows_for(num_frames, front)
    need = rows * front.hop_length
    b, s = bufs.shape
    if s < need:
        bufs = jnp.pad(bufs, ((0, 0), (0, need - s)))
    else:
        bufs = bufs[:, :need]
    return bufs.reshape(b, rows, front.hop_length)


def _kernel(front: FrontendConfig, num_frames: int, nbins_pad: int,
            fast_dft: bool, audio_ref, c_hi_ref, c_lo_ref, mel_ref, out_ref):
    hop, win = front.hop_length, front.window_length
    a = audio_ref[0]  # (R, hop)
    n_seg = -(-win // hop)
    hi_p = jax.lax.Precision.HIGHEST

    # DSP matmuls are numerically load-bearing (the log amplifies error).
    # fast_dft=True runs the windowed DFT as 3-pass bf16x3 (split operands,
    # drop the lo·lo term — ~16 mantissa bits, 2× the 6-pass fp32 rate);
    # False runs full 6-pass fp32 like the XLA path.  The mel projection is
    # always HIGHEST (1/8 the DFT FLOPs, and the log sits right behind it).
    acc = jnp.zeros((num_frames, 2 * nbins_pad), jnp.float32)
    for k in range(n_seg):
        lo, hi = k * hop, min((k + 1) * hop, win)
        seg = a[k:num_frames + k, : hi - lo]
        c_hi = c_hi_ref[lo:hi]
        if fast_dft:
            seg_hi = seg.astype(jnp.bfloat16)
            seg_lo = (seg - seg_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(seg_hi, c_hi, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(seg_hi, c_lo_ref[lo:hi],
                                preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(seg_lo, c_hi, preferred_element_type=jnp.float32)
        else:
            acc = acc + jnp.dot(seg, c_hi, precision=hi_p,
                                preferred_element_type=jnp.float32)

    re, im = acc[:, :nbins_pad], acc[:, nbins_pad:]
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[:], precision=hi_p,
                  preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(mel + front.log_offset) * front.log_scale + front.log_bias


def fused_log_mel(
    audio_rows: jnp.ndarray,   # (B, R, hop) hop-major zero-padded audio
    front: FrontendConfig,
    num_frames: int,
    *,
    interpret: bool = False,
    fast_dft: bool = False,
) -> jnp.ndarray:
    """→ log-mel (B, num_frames, num_mels), bit-compatible with
    dsp.log_mel_spectrogram over the same zero-padded buffer.

    fast_dft: run the DFT as 3-pass bf16x3 instead of 6-pass fp32
    (~16 mantissa bits; validate against goldens before serving)."""
    b, rows, hop = audio_rows.shape
    assert hop == front.hop_length
    assert rows >= audio_rows_for(num_frames, front), (
        f"need {audio_rows_for(num_frames, front)} rows, got {rows}")
    c, mel, nbins_pad = _padded_matrices(front)
    if fast_dft:
        c_hi, c_lo = _split_bf16(c)
    else:
        c_hi, c_lo = c, np.zeros((1, c.shape[1]), np.float32)  # lo unused

    # mirror shard_map manual axes into the output type so the kernel runs
    # per-shard under a mesh (see ops/encoder_attention._pallas_forward)
    vma = getattr(jax.typeof(audio_rows), "vma", None)
    out_shape = (jax.ShapeDtypeStruct((b, num_frames, front.num_mels),
                                      jnp.float32, vma=vma)
                 if vma else jax.ShapeDtypeStruct(
                     (b, num_frames, front.num_mels), jnp.float32))

    kern = functools.partial(_kernel, front, num_frames, nbins_pad, fast_dft)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, hop), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(c_hi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(c_lo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_frames, front.num_mels),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(audio_rows.astype(jnp.float32), jnp.asarray(c_hi), jnp.asarray(c_lo),
      jnp.asarray(mel))


def patch_index_arrays(lens: jnp.ndarray, front: FrontendConfig, patch: PatchConfig):
    """time/freq indices + mask for a batch, from true lengths alone
    (identical to patchify_spectrogram's integer outputs)."""
    tp, seq_len = patch.time_patch_size, patch.patches_seq_len
    f1 = front.num_mels // patch.freq_patch_size
    valid_frames = -(-lens.astype(jnp.int32) // front.hop_length)
    valid_patches = ((valid_frames // tp) * f1)[:, None]
    positions = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
    mask = (positions < valid_patches).astype(jnp.int32)
    inds = positions * mask
    return {
        "audio_time_inds": inds // f1,
        "audio_freq_inds": inds % f1,
        "audio_mask": mask,
    }


def fused_batch_wav_to_patches(
    bufs: jnp.ndarray,        # (B, samples) zero-padded waveform buffers
    lens: jnp.ndarray,        # (B,)
    front: FrontendConfig,
    patch: PatchConfig,
    *,
    interpret: bool = False,
    fast_dft: bool = False,
):
    """Drop-in batched replacement for vmap(wav_to_patches): full patch dict.
    DSP chain in the Pallas kernel; patchify transpose + masking in XLA.
    Falls back to the pure-XLA chain when the clip's frame count busts the
    kernel's VMEM budget (30 s+ buffers)."""
    num_frames = -(-bufs.shape[1] // front.hop_length)
    if not fits_vmem(num_frames, front):
        from cacophony_tpu.frontend.patchify import wav_to_patches

        lens_i = jnp.asarray(lens, jnp.int32)
        return jax.vmap(lambda b, n: wav_to_patches(b, n, front, patch))(
            bufs, lens_i)
    rows = buffer_to_rows(bufs, num_frames, front)
    logmel = fused_log_mel(rows, front, num_frames, interpret=interpret,
                           fast_dft=fast_dft)
    valid_frames = -(-lens.astype(jnp.int32) // front.hop_length)
    return jax.vmap(lambda s, n: patchify_spectrogram(s, n, patch))(
        logmel, valid_frames)
