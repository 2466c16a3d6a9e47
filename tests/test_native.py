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


# ------------------------------------------------------------------ FLAC
#
# No FLAC encoder exists in this environment, so the round-trip reference
# is a minimal FLAC encoder written here from the format spec (RFC 9639):
# it emits real FLAC bitstreams with constant / verbatim / fixed-predictor
# subframes, Rice-coded partitioned residuals, and left-side / right-side
# / mid-side stereo — everything the native decoder (flacio.cpp) claims.


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, n):
        self.write(0, n) if n else None
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(w, n):
    assert n < 0x80  # frame numbers stay tiny in tests
    w.write(n, 8)


def _rice_residual(w, res, param, porder, order, blocksize):
    """method 0 (4-bit rice), 2**porder partitions."""
    w.write(0, 2)
    w.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        w.write(param, 4)
        for _ in range(count):
            v = int(res[idx]); idx += 1
            u = 2 * v if v >= 0 else -2 * v - 1
            w.write_unary(u >> param)
            w.write(u & ((1 << param) - 1), param)
    assert idx == len(res)


def _subframe(w, samples, bps, kind, porder=0):
    w.write(0, 1)
    if kind == "constant":
        w.write(0, 6); w.write(0, 1)
        w.write(int(samples[0]), bps)
    elif kind == "verbatim":
        w.write(1, 6); w.write(0, 1)
        for s in samples:
            w.write(int(s), bps)
    else:  # fixed order 0/1/2
        order = int(kind[-1])
        w.write(0b001000 | order, 6); w.write(0, 1)
        a = np.asarray(samples, np.int64)
        for s in a[:order]:
            w.write(int(s), bps)
        if order == 0:
            res = a
        elif order == 1:
            res = a[1:] - a[:-1]
        else:
            res = a[2:] - 2 * a[1:-1] + a[:-2]
        _rice_residual(w, res, param=6, porder=porder, order=order,
                       blocksize=len(a))


def _crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _encode_flac(channels, sample_rate, block_size, kinds, stereo_mode=None,
                 porder=0):
    """channels: list of int arrays (same length); kinds: per-frame subframe
    kind; stereo_mode: None|'left_side'|'right_side'|'mid_side'."""
    n = len(channels[0])
    nch = len(channels)
    bps = 16
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16); si.write(block_size, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_bytes = bytes(si.bytes) + b"\x00" * 16  # md5 unset
    out += bytes([0x80, 0, 0, len(si_bytes)]) + si_bytes

    for fi, start in enumerate(range(0, n, block_size)):
        bs = min(block_size, n - start)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1); w.write(0, 1)
        w.write(0b0111, 4)              # 16-bit blocksize-1 at header end
        w.write(0, 4)                   # sample rate from streaminfo
        if stereo_mode is None:
            w.write(nch - 1, 4)
        else:
            w.write({"left_side": 8, "right_side": 9,
                     "mid_side": 10}[stereo_mode], 4)
        w.write(0b100, 3)               # 16 bps
        w.write(0, 1)
        _utf8_number(w, fi)
        w.write(bs - 1, 16)
        w.write(_crc8(bytes(w.bytes)), 8)

        kind = kinds[fi % len(kinds)]
        if stereo_mode is None:
            for c in range(nch):
                _subframe(w, channels[c][start:start + bs], bps, kind, porder)
        else:
            l = np.asarray(channels[0][start:start + bs], np.int64)
            r = np.asarray(channels[1][start:start + bs], np.int64)
            side = l - r
            if stereo_mode == "left_side":
                _subframe(w, l, bps, kind, porder)
                _subframe(w, side, bps + 1, kind, porder)
            elif stereo_mode == "right_side":
                _subframe(w, side, bps + 1, kind, porder)
                _subframe(w, r, bps, kind, porder)
            else:
                mid = (l + r) >> 1
                _subframe(w, mid, bps, kind, porder)
                _subframe(w, side, bps + 1, kind, porder)
        w.align()
        w.write(0, 16)  # frame CRC-16 (decoder reads, doesn't verify)
        out += bytes(w.bytes)
    return bytes(out)


@pytest.mark.parametrize("kinds", [["verbatim"], ["constant"],
                                   ["fixed0"], ["fixed1"], ["fixed2"],
                                   ["verbatim", "fixed2", "fixed1"]])
def test_flac_mono_roundtrip(tmp_path, kinds):
    rng = np.random.RandomState(1)
    n = 640
    if kinds == ["constant"]:
        x = np.full(n, -1234, np.int64)
    else:
        x = (rng.randn(n) * 3000).astype(np.int64)
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(_encode_flac([x], 16000, 256, kinds))
    data, sr = wavio.read_wav(path)
    assert sr == 16000 and data.shape == (n,)
    np.testing.assert_allclose(data, x / 32768.0, atol=1e-7)


@pytest.mark.parametrize("mode", [None, "left_side", "right_side", "mid_side"])
def test_flac_stereo_roundtrip(tmp_path, mode):
    rng = np.random.RandomState(2)
    n = 512
    l = (rng.randn(n) * 2000).astype(np.int64)
    r = (rng.randn(n) * 2000).astype(np.int64)
    path = str(tmp_path / "s.flac")
    with open(path, "wb") as f:
        f.write(_encode_flac([l, r], 22050, 256, ["fixed1"], stereo_mode=mode))
    data, sr = wavio.read_wav(path)
    assert sr == 22050 and data.shape == (n,)
    np.testing.assert_allclose(data, (l + r) / 2 / 32768.0, atol=1e-7)


def test_flac_rice_partitions_and_final_short_frame(tmp_path):
    rng = np.random.RandomState(3)
    n = 1000  # 3×256 frames + a 232-sample final frame
    x = (rng.randn(n) * 5000).astype(np.int64)
    path = str(tmp_path / "p.flac")
    with open(path, "wb") as f:
        f.write(_encode_flac([x], 44100, 256, ["fixed2"], porder=2))
    data, sr = wavio.read_wav(path)
    assert sr == 44100 and data.shape == (n,)
    np.testing.assert_allclose(data, x / 32768.0, atol=1e-7)


def test_flac_in_batch_decode(tmp_path):
    rng = np.random.RandomState(4)
    x = (rng.randn(300) * 1000).astype(np.int64)
    fpath = str(tmp_path / "b.flac")
    with open(fpath, "wb") as f:
        f.write(_encode_flac([x], 16000, 256, ["verbatim"]))
    wpath = str(tmp_path / "b.wav")
    wavfile.write(wpath, 16000, (x.astype(np.int16)))
    bufs, lens, rates = wavio.decode_batch([fpath, wpath], 400)
    assert list(lens) == [300, 300] and list(rates) == [16000, 16000]
    np.testing.assert_allclose(bufs[0, :300], x / 32768.0, atol=1e-7)
    np.testing.assert_allclose(bufs[0], bufs[1], atol=1e-7)


def test_load_audio_flac_resampled(tmp_path):
    from cacophony_tpu.data.audio_io import load_audio

    rng = np.random.RandomState(5)
    x = (rng.randn(441) * 8000).astype(np.int64)
    path = str(tmp_path / "r.flac")
    with open(path, "wb") as f:
        f.write(_encode_flac([x], 44100, 256, ["fixed2"]))
    out = load_audio(path)  # 44.1 kHz → 16 kHz
    assert out.shape == (160,)
    assert np.isfinite(out).all()
