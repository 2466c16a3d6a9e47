"""Freeze frontend golden vectors from the reference DSP stack.

Generates tests/goldens/frontend_tf.npz from tf.signal (the ops
tfio.audio.spectrogram/melscale wrap — reference
src/caco/caco_eval_utils.py:21-23), and — when tensorflow_io is importable —
cross-checks the tfio composition directly and records it in the same file
(keys with a `tfio_` prefix).  The goldens are committed so the frontend
parity tests (the declared #1 parity killer, SURVEY §7 hard-part 1) keep
running on machines without TensorFlow.

Usage: python scripts/freeze_frontend_goldens.py
"""

import os

import numpy as np

HOP, WIN, NFFT, MELS, SR = 160, 400, 512, 128, 16_000
LENGTHS = [16_000, 15_999, 4_321]  # exact-multiple, off-by-one, short
STFT_LEN = 8_000

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "frontend_tf.npz")


def main():
    import tensorflow as tf

    rng = np.random.RandomState(1234)
    arrays = {"hop": HOP, "win": WIN, "nfft": NFFT, "mels": MELS, "sr": SR}

    mel_matrix = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=MELS, num_spectrogram_bins=NFFT // 2 + 1, sample_rate=SR,
        lower_edge_hertz=0.0, upper_edge_hertz=SR / 2).numpy()
    arrays["mel_matrix"] = mel_matrix

    for n in LENGTHS:
        audio = (rng.randn(n) * 0.1).astype(np.float32)
        spec = tf.abs(tf.signal.stft(
            audio, frame_length=WIN, frame_step=HOP, fft_length=NFFT,
            window_fn=tf.signal.hann_window, pad_end=True))
        logmel = (tf.math.log(tf.tensordot(spec, mel_matrix, 1) + 1e-5)
                  * 0.2 + 0.9).numpy()
        arrays[f"audio_{n}"] = audio
        arrays[f"logmel_{n}"] = logmel.astype(np.float32)

    stft_audio = rng.randn(STFT_LEN).astype(np.float32)
    arrays["stft_audio"] = stft_audio
    arrays["stft_mag"] = tf.abs(tf.signal.stft(
        stft_audio, WIN, HOP, fft_length=NFFT,
        window_fn=tf.signal.hann_window, pad_end=True)).numpy()

    # tfio direct cross-check (reference calls tfio, not tf.signal):
    # tfio.audio.spectrogram(nfft=512, window=400, stride=160) and
    # tfio.audio.melscale(fmin=0, fmax=8000, mels=128)
    try:
        import tensorflow_io as tfio

        for n in LENGTHS:
            audio = arrays[f"audio_{n}"]
            spec = tfio.audio.spectrogram(audio, nfft=NFFT, window=WIN,
                                          stride=HOP)
            mel = tfio.audio.melscale(spec, rate=SR, mels=MELS, fmin=0,
                                      fmax=SR // 2)
            logmel = (tf.math.log(mel + 1e-5) * 0.2 + 0.9).numpy()
            arrays[f"tfio_logmel_{n}"] = logmel.astype(np.float32)
            drift = float(np.abs(logmel - arrays[f"logmel_{n}"]).max())
            print(f"tfio vs tf.signal (n={n}): max |Δ| = {drift:.3e}")
        arrays["has_tfio"] = np.array(1)
    except ImportError:
        print("tensorflow_io not importable: goldens are tf.signal-only "
              "(tfio wraps these ops; rerun where tfio is installed to "
              "add the direct cross-check)")
        arrays["has_tfio"] = np.array(0)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {os.path.abspath(OUT)} "
          f"({os.path.getsize(OUT) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
