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
    read_wav,
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
