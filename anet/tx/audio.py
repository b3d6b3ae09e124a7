"""Audio file ingest + PCM format conversion.

The javax.sound AudioSystem analog (Main.kt:15, MulticastAudioOutput.kt:
38-45,98-114): read WAV containers with the stdlib, normalize arbitrary
PCM to an Opus-supported format — 16-bit signed LE, 1-2 channels, rate in
{8,12,16,24,48} kHz, falling back to 48 kHz stereo like the reference.
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np

from anet.codec.opus import AudioFormat, SUPPORTED_SAMPLE_RATES


def read_wav(path: str) -> Tuple[np.ndarray, AudioFormat]:
    """WAV file -> (int16 samples [n, channels], format card)."""
    with wave.open(path, "rb") as wav:
        channels = wav.getnchannels()
        rate = wav.getframerate()
        width = wav.getsampwidth()
        raw = wav.readframes(wav.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, np.int16)
    elif width == 1:  # 8-bit WAV is unsigned
        samples = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8).astype(
            np.int16
        )
    elif width == 4:
        samples = (np.frombuffer(raw, np.int32) >> 16).astype(np.int16)
    elif width == 3:  # 24-bit packed
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        val = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        samples = (val >> 8).astype(np.int16)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = samples.reshape(-1, channels)
    return samples, AudioFormat(sample_rate_hz=rate, channels=channels)


def nearest_supported_rate(rate: int) -> int:
    """Smallest supported rate >= rate, else 48 kHz (the reference converts
    up rather than losing bandwidth, fallback MulticastAudioOutput.kt:158)."""
    for candidate in SUPPORTED_SAMPLE_RATES:
        if candidate >= rate:
            return candidate
    return 48_000


def convert(
    samples: np.ndarray, fmt: AudioFormat, target: AudioFormat
) -> np.ndarray:
    """Convert int16 [n, ch] PCM between formats (rate + channel count)."""
    out = samples
    if fmt.channels != target.channels:
        if fmt.channels == 1:
            out = np.repeat(out, target.channels, axis=1)
        else:
            # Mix every source channel down (dropping channels would
            # silently discard content), then spread across the targets.
            mono = out.mean(axis=1, dtype=np.int32).astype(np.int16)[:, None]
            out = np.repeat(mono, target.channels, axis=1)
    if fmt.sample_rate_hz != target.sample_rate_hz:
        n_in = out.shape[0]
        n_out = int(round(n_in * target.sample_rate_hz / fmt.sample_rate_hz))
        # Linear interpolation resampler; adequate for transport (the
        # reference delegates to AudioSystem's converter, equally plain).
        x_in = np.arange(n_in, dtype=np.float64)
        x_out = np.linspace(0, n_in - 1, n_out)
        out = np.stack(
            [
                np.interp(x_out, x_in, out[:, c].astype(np.float64))
                for c in range(out.shape[1])
            ],
            axis=1,
        ).astype(np.int16)
    return out


def normalize_for_opus(samples: np.ndarray, fmt: AudioFormat) -> Tuple[np.ndarray, AudioFormat]:
    """Return (samples, format) in an Opus-supported format, converting if
    needed (fallback target: source-rate-rounded-up, stereo preserved)."""
    try:
        fmt.validate_for_opus()
        return samples, fmt
    except Exception:
        target = AudioFormat(
            sample_rate_hz=nearest_supported_rate(fmt.sample_rate_hz),
            channels=min(fmt.channels, 2),
        )
        return convert(samples, fmt, target), target


def pcm_bytes(samples: np.ndarray) -> bytes:
    """int16 [n, ch] -> interleaved little-endian bytes."""
    return samples.astype("<i2").tobytes()
