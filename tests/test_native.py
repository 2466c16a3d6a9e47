"""Native C++ WAV decoder (ctypes) vs scipy, incl. threaded batch decode."""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:  # pragma: no cover
    pytest.skip("no C++ toolchain", allow_module_level=True)

from scipy.io import wavfile

from cacophony_tpu.native import wavio


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    x = (rng.randn(22050, 2) * 0.1).astype(np.float32)
    p16 = str(d / "t16.wav")
    wavfile.write(p16, 22050, (x * 32767).astype(np.int16))
    pf32 = str(d / "tf32.wav")
    wavfile.write(pf32, 16000, x[:16000, 0])
    p32 = str(d / "t32.wav")
    wavfile.write(p32, 8000, (x[:8000, 0] * 2**31).astype(np.int32))
    return x, p16, pf32, p32


def test_pcm16_stereo_mixdown(wavs):
    x, p16, _, _ = wavs
    data, sr = wavio.read_wav(p16)
    assert sr == 22050 and data.shape == (22050,)
    expected = (x * 32767).astype(np.int16).astype(np.float32).mean(-1) / 32768.0
    np.testing.assert_allclose(data, expected, atol=1e-6)


def test_float32_and_int32(wavs):
    x, _, pf32, p32 = wavs
    d, sr = wavio.read_wav(pf32)
    assert sr == 16000
    np.testing.assert_allclose(d, x[:16000, 0], atol=1e-7)
    d, sr = wavio.read_wav(p32)
    np.testing.assert_allclose(
        d, (x[:8000, 0] * 2**31).astype(np.int32) / 2**31, atol=1e-6)


def test_batch_decode_threaded(wavs):
    x, p16, pf32, _ = wavs
    bufs, lens, rates = wavio.decode_batch([p16, pf32, "/nonexistent.wav"], 20000)
    assert lens.tolist() == [20000, 16000, 0]
    assert rates.tolist() == [22050, 16000, 0]
    np.testing.assert_allclose(bufs[1, :16000], x[:16000, 0], atol=1e-7)
    assert bufs[1, 16000:].sum() == 0


def test_audio_io_uses_native_path(wavs):
    """read_wav in data.audio_io must route through the native decoder and
    agree with it."""
    from cacophony_tpu.data.audio_io import read_wav

    _, p16, _, _ = wavs
    a, sr_a = read_wav(p16)
    b, sr_b = wavio.read_wav(p16)
    assert sr_a == sr_b
    np.testing.assert_allclose(a, b, atol=1e-6)
