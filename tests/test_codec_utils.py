"""Codec layer (Opus via system libopus, ring buffer) and pacing tests."""

import numpy as np
import pytest

from anet import constants
from anet.codec import (
    AudioFormat,
    AudioFormatNotSupportedError,
    ByteRingBuffer,
    OpusDecoder,
    OpusEncoder,
    RingBufferError,
    opus_available,
    opus_version,
)
from anet.utils import LeakyBucket, SimulatedClock

needs_opus = pytest.mark.skipif(not opus_available(), reason="libopus not present")


# --- ring buffer (ByteRingBufferTest.kt parity) ------------------------------

def test_ring_fresh_state():
    rb = ByteRingBuffer(16)
    assert rb.remaining_read == 0
    assert rb.remaining_write == 16


def test_ring_overflow_raises():
    rb = ByteRingBuffer(4)
    rb.put(b"abcd")
    with pytest.raises(RingBufferError, match="overflow"):
        rb.put(b"e")


def test_ring_underflow_raises():
    rb = ByteRingBuffer(4)
    rb.put(b"ab")
    with pytest.raises(RingBufferError, match="underflow"):
        rb.get(3)


def test_ring_wraparound_roundtrip():
    rb = ByteRingBuffer(8)
    rb.put(b"abcdef")
    assert rb.get(4) == b"abcd"
    rb.put(b"ghijkl")  # wraps
    assert rb.get(8) == b"efghijkl"
    assert rb.remaining_read == 0


def test_ring_exact_fill():
    rb = ByteRingBuffer(5)
    rb.put(b"12345")
    assert rb.remaining_write == 0
    assert rb.get(5) == b"12345"


def test_ring_peek_does_not_consume():
    rb = ByteRingBuffer(8)
    rb.put(b"abc")
    assert rb.peek(2) == b"ab"
    assert rb.get(3) == b"abc"


# --- format validation (OpusEncoder.kt:22-41) --------------------------------

@pytest.mark.parametrize(
    "fmt,msg",
    [
        (AudioFormat(sample_rate_hz=44_100), "sample rate"),
        (AudioFormat(channels=3), "mono/stereo"),
        (AudioFormat(bits_per_sample=24), "16-bit"),
        (AudioFormat(little_endian=False), "little-endian"),
        (AudioFormat(signed=False), "signed"),
    ],
)
def test_format_validation(fmt, msg):
    with pytest.raises(AudioFormatNotSupportedError, match=msg):
        fmt.validate_for_opus()


# --- opus round trip ---------------------------------------------------------

@needs_opus
def test_opus_version_string():
    assert "libopus" in opus_version()


@needs_opus
def test_opus_encode_decode_roundtrip():
    enc = OpusEncoder(AudioFormat(48_000, 2))
    t = np.arange(int(48_000 * 0.3))
    pcm = (0.3 * 32767 * np.sin(2 * np.pi * 440 * t / 48_000)).astype(np.int16)
    stereo = np.repeat(pcm, 2).tobytes()
    frames = enc.submit(stereo) + enc.final()
    assert frames, "no frames encoded"
    assert all(len(f) <= constants.MAX_ENCODED_FRAME_SIZE for f in frames)
    # 300 ms at 60 ms frames -> 5 frames
    assert len(frames) == 5
    dec = OpusDecoder()
    pcm_out = b"".join(dec.decode(f) for f in frames)
    # decoded at 48k stereo 16-bit: 5 frames x 11520 bytes
    assert len(pcm_out) == 5 * constants.MAX_DECODED_FRAME_SIZE
    x = np.frombuffer(pcm_out, np.int16).astype(np.float32)
    assert np.sqrt(np.mean(x**2)) > 1000  # not silence


@needs_opus
def test_opus_frame_duration_negotiation():
    enc = OpusEncoder(AudioFormat(48_000, 2))
    assert enc.frame_duration_ms == 60.0
    assert enc.decoded_frame_bytes_at_48k_stereo() == 11_520
    enc.frame_duration_ms = 20.0
    assert enc.samples_per_frame == 960
    assert enc.decoded_frame_bytes_at_48k_stereo() == 3_840
    with pytest.raises(ValueError, match="frame duration"):
        enc.frame_duration_ms = 25.0


@needs_opus
def test_opus_final_pads_partial_frame():
    enc = OpusEncoder(AudioFormat(48_000, 1), frame_duration_ms=20.0)
    # 10 ms of mono audio = half a frame
    pcm = np.zeros(480, np.int16).tobytes()
    assert enc.submit(pcm) == []
    frames = enc.final()
    assert len(frames) == 1


@needs_opus
def test_opus_decoder_rejects_garbage():
    from anet.codec import OpusError

    dec = OpusDecoder()
    with pytest.raises(OpusError):
        dec.decode(b"\xde\xad\xbe\xef" * 10)


# --- leaky bucket (LeakyBucket.kt parity, simulated clock) -------------------

def test_bucket_fills_and_drains():
    clock = SimulatedClock()
    b = LeakyBucket.simulated(clock, capacity=1200.0, drain_per_second=1000.0)
    assert b.try_put(1200.0) == 0.0
    wait = b.try_put(60.0)
    assert wait == pytest.approx(0.06)
    clock.advance(0.06)
    assert b.try_put(60.0) == 0.0


def test_bucket_wait_for_capacity_sleeps_virtual_time():
    clock = SimulatedClock()
    b = LeakyBucket.simulated(clock, capacity=100.0, drain_per_second=100.0)
    b.wait_for_capacity(100.0)
    t0 = clock.now()
    b.wait_for_capacity(50.0)  # needs 0.5 s of drain
    assert clock.now() - t0 == pytest.approx(0.5)


def test_bucket_rejects_oversized_put():
    b = LeakyBucket(capacity=10.0, drain_per_second=1.0)
    with pytest.raises(ValueError, match="exceeds bucket capacity"):
        b.try_put(11.0)


def test_bucket_models_receiver_queue():
    """Steady-state pacing: pushing 60 ms frames through the default bucket
    settles at ~1x real time (MulticastAudioOutput.kt:79-86 rationale)."""
    clock = SimulatedClock()
    b = LeakyBucket.simulated(clock)  # 1200 ms cap, 1000 ms/s drain
    t0 = clock.now()
    for _ in range(100):
        b.wait_for_capacity(60.0)
    elapsed = clock.now() - t0
    # 100 x 60 ms = 6 s of audio; bucket allows 1.2 s ahead -> >= 4.8 s wall
    assert 4.7 <= elapsed <= 6.0
