"""The modem signal chain (JAX, array-in/array-out).

This package replaces the reference's physical transport (Opus over
WiFi/TCP) with a TPU-computed acoustic modem, per the rebuild's north star:
MFSK tone synthesis on transmit, a tone-energy filterbank demodulator on
receive (formulated as one large matmul so it runs on the MXU rather than as
a sequential Goertzel IIR), preamble cross-correlation sync, and PHY framing
that carries ip.proto payload bytes unchanged.

Everything is a pure function over arrays: `vmap` for stream batches,
`shard_map` over a mesh for scale (anet.parallel), `lax.scan` for streaming
state (anet.stream).
"""

from anet.dsp.params import ModemConfig
from anet.dsp.bits import (
    bits_to_bytes,
    bytes_to_bits,
    gray_decode,
    gray_encode,
    pack_symbols,
    unpack_symbols,
)
from anet.dsp.mod import modulate_symbols, synthesize_tones
from anet.dsp.demod import decide_symbols, demodulate_symbols, tone_energies
from anet.dsp.sync import locate_preamble, preamble_waveform
from anet.dsp.frame import (
    FrameResult,
    frame_num_symbols,
    modulate_frame,
    demodulate_frame,
)
from anet.dsp import family, ofdm
from anet.dsp.clock import demodulate_symbols_tracked, estimate_drift_ppm
from anet.dsp.fec import (
    conv_encode,
    crc32_device,
    interleave,
    viterbi_decode,
    viterbi_decode_soft,
)
from anet.dsp.pipeline import (
    loopback,
    receive_frame,
    receive_frame_tracked,
    transmit,
)

__all__ = [
    "ModemConfig",
    "bits_to_bytes",
    "bytes_to_bits",
    "gray_decode",
    "gray_encode",
    "pack_symbols",
    "unpack_symbols",
    "modulate_symbols",
    "synthesize_tones",
    "decide_symbols",
    "demodulate_symbols",
    "tone_energies",
    "locate_preamble",
    "preamble_waveform",
    "FrameResult",
    "frame_num_symbols",
    "modulate_frame",
    "demodulate_frame",
    "family",
    "ofdm",
    "demodulate_symbols_tracked",
    "estimate_drift_ppm",
    "conv_encode",
    "crc32_device",
    "interleave",
    "viterbi_decode",
    "viterbi_decode_soft",
    "loopback",
    "receive_frame",
    "receive_frame_tracked",
    "transmit",
]
