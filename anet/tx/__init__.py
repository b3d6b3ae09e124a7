"""Transmitter: session orchestration, pacing, audio ingest."""

from anet.tx.session import MulticastAudioOutput, MulticastOutputStream, ReceiverStats
from anet.tx.audio import convert, normalize_for_opus, pcm_bytes, read_wav

__all__ = [
    "MulticastAudioOutput",
    "MulticastOutputStream",
    "ReceiverStats",
    "convert",
    "normalize_for_opus",
    "pcm_bytes",
    "read_wav",
]
