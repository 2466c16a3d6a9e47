"""Fused Pallas frontend: waveform → log-mel → ViT patches in ONE kernel.

The XLA path (dsp.py + patchify.py) materializes every intermediate in HBM
— padded audio, 2× spectra, magnitude, mel, log-mel, patch transpose —
~6 round-trips per clip for bandwidth-bound work (measured ~35 ms per
128×10 s batch on v5e, ~20% of pipeline time).  This kernel keeps the whole
chain in VMEM: per grid step one clip's hop-major audio block streams in,
the windowed real DFT runs as segmented matmuls against lane-padded
cos/sin matrices, magnitude → mel → log → patchify happen in registers,
and only the (seq_len, 256) patch block streams out.  HBM traffic drops
from ~6 passes to read-audio + write-patches.

Semantics are bit-compatible with the XLA path (same tfio frame rule,
periodic Hann folded into the DFT matrices, TF mel matrix, log scaling,
first-N/zero-pad patch policy + validity masking — reference
src/caco/caco_eval_utils.py:12-24 and src/caco/dataset.py:55-93); parity
is pinned by tests/test_fused_frontend.py against dsp.py/patchify.py.

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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _padded_matrices(front: FrontendConfig):
    """DFT (cos/sin, Hann folded in) and mel matrices, lane-padded to 128
    multiples.  Padded spectrogram bins are zero columns → zero magnitude →
    multiplied by zero mel rows: exact."""
    cr, ci = _windowed_dft_matrices(front.window_length, front.fft_size)
    mel = linear_to_mel_matrix(front)
    nbins = cr.shape[1]
    nbins_pad = _round_up(nbins, 128)
    cr = np.pad(cr, [[0, 0], [0, nbins_pad - nbins]])
    ci = np.pad(ci, [[0, 0], [0, nbins_pad - nbins]])
    mel = np.pad(mel, [[0, nbins_pad - nbins], [0, 0]])
    return cr, ci, mel


def audio_rows_for(num_frames: int, front: FrontendConfig) -> int:
    """Rows of the (R, hop) hop-major audio layout the kernel consumes."""
    n_seg = -(-front.window_length // front.hop_length)
    return num_frames + n_seg


def buffer_to_rows(bufs: jnp.ndarray, num_frames: int, front: FrontendConfig):
    """(B, samples) zero-padded buffers → (B, R, hop) hop-major rows.

    Pure pad+reshape; prefer writing host buffers in this shape directly
    (engine does) so this costs nothing."""
    rows = audio_rows_for(num_frames, front)
    need = rows * front.hop_length
    b, s = bufs.shape
    if s < need:
        bufs = jnp.pad(bufs, ((0, 0), (0, need - s)))
    else:
        bufs = bufs[:, :need]
    return bufs.reshape(b, rows, front.hop_length)


def _kernel(front: FrontendConfig, patch: PatchConfig, num_frames: int,
            lens_ref, audio_ref, cr_ref, ci_ref, mel_ref, out_ref):
    hop, win = front.hop_length, front.window_length
    tp, fp_, seq_len = patch.time_patch_size, patch.freq_patch_size, patch.patches_seq_len
    f1 = front.num_mels // fp_
    t1 = num_frames // tp
    n_valid = t1 * tp  # frames that survive the trim-to-multiple rule

    a = audio_ref[0]  # (R, hop)
    n_seg = -(-win // hop)

    # DSP matmuls are numerically load-bearing (the log amplifies error):
    # full fp32 passes on the MXU, same as the XLA path.
    hi_p = jax.lax.Precision.HIGHEST
    re = jnp.zeros((n_valid, cr_ref.shape[1]), jnp.float32)
    im = jnp.zeros((n_valid, cr_ref.shape[1]), jnp.float32)
    for k in range(n_seg):
        lo, hi = k * hop, min((k + 1) * hop, win)
        seg = a[k:n_valid + k, : hi - lo]
        re = re + jnp.dot(seg, cr_ref[lo:hi], precision=hi_p,
                          preferred_element_type=jnp.float32)
        im = im + jnp.dot(seg, ci_ref[lo:hi], precision=hi_p,
                          preferred_element_type=jnp.float32)

    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[:], precision=hi_p,
                  preferred_element_type=jnp.float32)
    logmel = jnp.log(mel + front.log_offset) * front.log_scale + front.log_bias

    # patchify: (t1*tp, mels) → (t1, tp, f1, fp) → (t1, f1, tp, fp) → (t1*f1, tp*fp)
    x = logmel.reshape(t1, tp, f1, fp_)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(t1 * f1, tp * fp_)
    if t1 * f1 >= seq_len:
        x = x[:seq_len]
    else:
        x = jnp.pad(x, ((0, seq_len - t1 * f1), (0, 0)))

    # validity mask from THIS clip's true length (tfio frames = ceil(len/hop));
    # lens_ref is the full (B,) scalar-prefetch array
    valid_frames = -(-lens_ref[pl.program_id(0)] // hop)
    valid_patches = (valid_frames // tp) * f1
    rows = jax.lax.broadcasted_iota(jnp.int32, (seq_len, tp * fp_), 0)
    out_ref[0] = jnp.where(rows < valid_patches, x, 0.0)


def fused_wav_to_patch_values(
    audio_rows: jnp.ndarray,   # (B, R, hop) hop-major zero-padded audio
    lens: jnp.ndarray,         # (B,) true sample counts
    front: FrontendConfig,
    patch: PatchConfig,
    num_frames: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ audio_patches (B, seq_len, tp·fp), masked like patchify_spectrogram.

    time/freq indices + mask are integer functions of `lens` alone — compute
    them with `patch_index_arrays` (XLA, negligible)."""
    b, rows, hop = audio_rows.shape
    assert hop == front.hop_length
    assert rows >= audio_rows_for(num_frames, front), (
        f"need {audio_rows_for(num_frames, front)} rows, got {rows}")
    cr, ci, mel = _padded_matrices(front)
    seq_len, psize = patch.patches_seq_len, patch.patch_size

    kern = functools.partial(_kernel, front, patch, num_frames)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, hop), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cr.shape, lambda i, lens: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ci.shape, lambda i, lens: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel.shape, lambda i, lens: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seq_len, psize), lambda i, lens: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, seq_len, psize), jnp.float32),
        interpret=interpret,
    )(lens.astype(jnp.int32), audio_rows.astype(jnp.float32),
      jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(mel))


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
):
    """Drop-in batched replacement for vmap(wav_to_patches): full patch dict."""
    num_frames = -(-bufs.shape[1] // front.hop_length)
    rows = buffer_to_rows(bufs, num_frames, front)
    values = fused_wav_to_patch_values(rows, lens, front, patch, num_frames,
                                       interpret=interpret)
    out = patch_index_arrays(lens, front, patch)
    out["audio_patches"] = values
    return out
