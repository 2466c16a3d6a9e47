from cacophony_tpu.frontend.dsp import (
    hann_window_periodic,
    linear_to_mel_matrix,
    log_mel_spectrogram,
    num_stft_frames,
    resample_fft,
    resample_fft_host,
    stft_magnitude,
)
from cacophony_tpu.frontend.fused import (
    fused_batch_wav_to_patches,
    fused_log_mel,
    patch_index_arrays,
)
from cacophony_tpu.frontend.patchify import num_patches_for_samples, patchify_spectrogram, wav_to_patches

__all__ = [
    "fused_batch_wav_to_patches",
    "fused_log_mel",
    "patch_index_arrays",
    "hann_window_periodic",
    "linear_to_mel_matrix",
    "log_mel_spectrogram",
    "num_stft_frames",
    "resample_fft",
    "resample_fft_host",
    "stft_magnitude",
    "patchify_spectrogram",
    "wav_to_patches",
    "num_patches_for_samples",
]
