"""anet — a TPU-native audio-network framework.

A ground-up rebuild of the capabilities of tmarsteel/audio-network (a LAN
audio-streaming system: Kotlin transmitter -> Opus/TCP -> ESP32 receivers,
with UDP discovery and capability negotiation) as an idiomatic
JAX/XLA/Pallas framework:

- ``anet.proto``    — the ip.proto wire contract (pure-Python proto2 codec +
                      varint-delimited framing), byte-compatible with both
                      reference implementations (protobuf-java and nanopb).
- ``anet.codec``    — the audio codec layer (Opus via ctypes to the system
                      libopus; frame chunking with ring-buffer semantics).
- ``anet.dsp``      — the modem signal chain: MFSK tone synthesis, Goertzel
                      filterbank demodulation (matmul-formulated for the MXU),
                      preamble sync, symbol clock recovery.
- ``anet.channel``  — AWGN / multipath / dropout channel simulator (the
                      framework's fault-injection layer).
- ``anet.stream``   — chunked-scan streaming runtime with explicit carry
                      state (resume/underflow semantics).
- ``anet.parallel`` — mesh/shard_map batch processing and BER sweeps.
- ``anet.kernels``  — Pallas TPU kernels for the hot demod loops.
- ``anet.net``      — host-edge networking runtime (C++ core + Python):
                      discovery, capability negotiation, framed TCP streaming.
- ``anet.tx`` / ``anet.rx`` — transmitter session / receiver runtime
                      (fan-out, pacing, bounded-queue playback, underflow).
- ``anet.obs``      — metrics and status surfaces.

See SURVEY.md at the repo root for the structural analysis of the reference
this build is based on.
"""

__version__ = "0.1.0"

from anet import constants  # noqa: F401
