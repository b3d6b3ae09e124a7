"""PHY framing: payload bytes <-> modulated frame waveform.

Frame layout (all multi-byte fields big-endian):

    [ preamble: config.preamble_symbols alternating tones ]
    [ magic word        4 B ]  0x2C5DA044 — same magic as the wire protocol
    [ payload length    2 B ]  uint16, <= MAX_ENCODED_FRAME_SIZE (4096)
    [ header CRC        2 B ]  low 16 bits of CRC-32 over the 6 bytes above
    [ payload           N B ]  e.g. a varint-delimited ip.proto message
    [ payload CRC       4 B ]  CRC-32 over the payload

The data section is Gray-mapped onto MFSK symbols, zero-bit padded up to a
whole symbol (the tail-pad analog of OpusEncoder.final(),
OpusEncoder.kt:116-127). The magic-word check mirrors the reference's
datagram filtering (discovery.kt:87-89); the 4096 cap mirrors
network.cpp:24. Payload bytes ride unchanged, so a demodulated frame body
parses with any of the three wire codecs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from anet import constants
from anet.dsp.bits import bits_to_bytes, bytes_to_bits, pack_symbols, unpack_symbols
from anet.dsp.demod import estimate_snr_db, tone_energies, decide_symbols
from anet.dsp.fec import crc32_device, crc32_host
from anet.dsp.mod import modulate_symbols, synthesize_tones
from anet.dsp.params import ModemConfig
from anet.dsp.sync import preamble_tone_indices

HEADER_BYTES = 8
TRAILER_BYTES = 4
OVERHEAD_BYTES = HEADER_BYTES + TRAILER_BYTES


def data_section_bytes(payload_len: int) -> int:
    return OVERHEAD_BYTES + payload_len


def data_section_coded_bits(config: ModemConfig, payload_len: int) -> int:
    """Bits on the air for the data section (after optional FEC)."""
    return config.coded_bits_for_data_bits(8 * data_section_bytes(payload_len))


def data_symbols_for_payload(config: ModemConfig, payload_len: int) -> int:
    return config.symbols_for_bits(data_section_coded_bits(config, payload_len))


def frame_num_symbols(config: ModemConfig, payload_len: int) -> int:
    """Total symbols including preamble."""
    return config.preamble_symbols + data_symbols_for_payload(config, payload_len)


def frame_num_samples(config: ModemConfig, payload_len: int) -> int:
    return frame_num_symbols(config, payload_len) * config.samples_per_symbol


def _header_np(payload_len: int) -> np.ndarray:
    """The 8 header bytes — static given payload_len, so built host-side."""
    if not 0 <= payload_len <= constants.MAX_ENCODED_FRAME_SIZE:
        raise ValueError(
            f"payload_len {payload_len} outside [0, {constants.MAX_ENCODED_FRAME_SIZE}]"
        )
    head = constants.MAGIC_WORD.to_bytes(4, "big") + payload_len.to_bytes(2, "big")
    hcrc = crc32_host(head) & 0xFFFF
    return np.frombuffer(head + hcrc.to_bytes(2, "big"), dtype=np.uint8).copy()


def _u32_to_be_bytes(value: jnp.ndarray) -> jnp.ndarray:
    """uint32[...] -> uint8[..., 4] big-endian."""
    shifts = jnp.array([24, 16, 8, 0], dtype=jnp.uint32)
    return ((value[..., None] >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)


def _be_bytes_to_u32(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 4] -> uint32[...]."""
    shifts = jnp.array([24, 16, 8, 0], dtype=jnp.uint32)
    return jnp.sum(data.astype(jnp.uint32) << shifts, axis=-1, dtype=jnp.uint32)


def _be16(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 2] -> uint32[...] big-endian."""
    return jnp.sum(
        data.astype(jnp.uint32) << jnp.array([8, 0], dtype=jnp.uint32),
        axis=-1,
        dtype=jnp.uint32,
    )


def _parse_header(header: jnp.ndarray):
    """The 8 header bytes -> (magic, declared length, header_crc_ok).

    Shared by the fixed- and dynamic-length parsers."""
    magic = _be_bytes_to_u32(header[..., :4])
    length = _be16(header[..., 4:6])
    hcrc_calc = crc32_device(header[..., :6]) & jnp.uint32(0xFFFF)
    return magic, length, hcrc_calc == _be16(header[..., 6:8])


def data_section_air_bits_array(config, payload: jnp.ndarray) -> jnp.ndarray:
    """payload uint8[..., N] -> on-air data-section bits uint8[..., bits].

    Builds header + payload + CRC, then applies the config's FEC and
    interleaver. ``config`` only needs the FEC surface, so both modulation
    families (MFSK symbol mapping, OFDM carrier mapping) share this.
    """
    n = payload.shape[-1]
    header = jnp.broadcast_to(
        jnp.asarray(_header_np(n)), payload.shape[:-1] + (HEADER_BYTES,)
    )
    crc = crc32_device(payload)
    section = jnp.concatenate(
        [header, payload.astype(jnp.uint8), _u32_to_be_bytes(crc)], axis=-1
    )
    bits = bytes_to_bits(section)
    if config.fec == "conv":
        from anet.dsp.fec import conv_encode, interleave

        bits = interleave(conv_encode(bits), config.fec_interleave)
    return bits


def frame_data_symbols(config: ModemConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """payload uint8[..., N] -> data-section symbols int32[..., S_data]."""
    bits = data_section_air_bits_array(config, payload)
    pad = (-bits.shape[-1]) % config.bits_per_symbol
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), dtype=bits.dtype)], axis=-1
        )
    return pack_symbols(bits, config.bits_per_symbol)


def modulate_frame(config: ModemConfig, payload: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """payload uint8[..., N] -> frame waveform float[..., frame_num_samples]."""
    data_syms = frame_data_symbols(config, payload)
    pre = jnp.broadcast_to(
        preamble_tone_indices(config), payload.shape[:-1] + (config.preamble_symbols,)
    )
    preamble_wave = synthesize_tones(config, pre, dtype=dtype)
    data_wave = modulate_symbols(config, data_syms, dtype=dtype)
    return jnp.concatenate([preamble_wave, data_wave], axis=-1)


class FrameResult(NamedTuple):
    """Demodulated frame + integrity verdicts (all batched alike).

    ``ok`` is the conjunction a receiver acts on; the split verdicts feed the
    quality-feedback loop (the implemented ReceiverError path, ip.proto:56-61).
    """

    payload: jnp.ndarray  # uint8[..., N]
    magic_ok: jnp.ndarray  # bool[...]
    length_ok: jnp.ndarray  # bool[...]
    header_crc_ok: jnp.ndarray  # bool[...]
    payload_crc_ok: jnp.ndarray  # bool[...]
    ok: jnp.ndarray  # bool[...]
    confidence: jnp.ndarray  # float32[...] mean winning-tone energy ratio
    snr_db: jnp.ndarray  # float32[...] filterbank SNR estimate


def demodulate_frame(
    config: ModemConfig,
    samples: jnp.ndarray,
    payload_len: int,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
) -> FrameResult:
    """Symbol-aligned frame waveform -> payload + verdicts.

    ``samples`` must start exactly at the frame start (use
    anet.dsp.pipeline.receive_frame / anet.stream for unaligned captures)
    and have length frame_num_samples(config, payload_len).

    ``use_pallas`` routes the filterbank through the fused TPU kernel
    (anet.kernels); the jnp path is the golden model.
    """
    sps = config.samples_per_symbol
    data_start = config.preamble_symbols * sps
    data = samples[..., data_start:]
    if use_pallas:
        from anet.kernels import tone_energies_fused

        energies = tone_energies_fused(config, data, compute_dtype=compute_dtype)
    else:
        energies = tone_energies(config, data, compute_dtype=compute_dtype)
    symbols = decide_symbols(config, energies)
    return frame_result_from_decisions(config, symbols, energies, payload_len)


def demodulate_frame_tm(
    config: ModemConfig,
    samples_tm: jnp.ndarray,
    payload_len: int,
    *,
    compute_dtype=jnp.bfloat16,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> FrameResult:
    """demodulate_frame for TIME-MAJOR input: samples_tm is [T, B] with the
    stream batch in the minor dimension (the natural layout for sample-
    interleaved multi-stream ingest, and the fast one on TPU).

    Why a layout variant exists at all: the batch-major [B, T] ->
    [B, S, sps] symbol split forces a lane-dimension relayout that
    measures ~30% of the whole receiver's runtime on a v5e (docs/PERF.md).
    Time-major makes the same split a major-dimension view — no data
    movement — and flips every reduction in the filterbank onto the cheap
    sublane axis. With the fused Pallas kernel (anet.kernels
    decide_tones_tm) the aligned receiver measures 2x the batch-major
    path. Only the per-symbol decisions and two quality scalars cross back
    to batch-major (1/64th of the input), where the shared frame parser
    finishes the job.

    Coded (fec='conv') configs need full per-tone energies for soft
    decisions; they take the jnp path and transpose the energies (1/4 of
    the input — still cheaper than relayouting the input itself).
    """
    from anet.dsp.bits import gray_decode
    from anet.dsp.demod import bit_llrs, demod_basis

    if use_pallas is None:
        # Auto-select like fec._viterbi: the fused kernel on TPU, the
        # golden jnp path elsewhere (Mosaic kernels cannot run on CPU
        # outside interpret mode).
        use_pallas = jax.default_backend() == "tpu"
    sps = config.samples_per_symbol
    m = config.num_tones
    pre = config.preamble_symbols * sps
    data = samples_tm[pre:, :]
    s = data.shape[0] // sps
    b = data.shape[1]
    llrs = None
    if jnp.dtype(compute_dtype) == jnp.dtype(jnp.int8) and (
        config.fec == "conv"
        or not use_pallas
        or config.bits_per_symbol not in (1, 2, 4)
        or config.num_tones > 16
    ):
        raise ValueError(
            "int8 compute is the full-fusion kernel's quantized-ingest "
            "path only (uncoded, bps in {1,2,4}, <=16 tones, TPU)"
        )
    if config.fec == "conv" or not use_pallas:
        # Golden jnp path (any backend); also the coded path: full
        # energies in time-major, then one small transpose for the LLRs.
        w = data[: s * sps].reshape(s, sps, b).astype(compute_dtype)
        basis_t = demod_basis(config, dtype=compute_dtype).T  # [2M, sps]
        iq = jnp.einsum(
            "mk,skb->smb", basis_t, w, preferred_element_type=jnp.float32
        )
        e = jnp.square(iq[:, :m]) + jnp.square(iq[:, m:])  # [S, M, B]
        tone = jnp.argmax(e, axis=1).astype(jnp.int32)  # [S, B]
        best = jnp.max(e, axis=1)
        total = jnp.sum(e, axis=1)
        if config.fec == "conv":
            llrs = bit_llrs(config, jnp.moveaxis(e, -1, 0))  # [B, S*bps]
    else:
        if (
            config.bits_per_symbol in (1, 2, 4)
            and config.num_tones <= 16
            and s == data_symbols_for_payload(config, payload_len)
        ):
            # The exact-window gate keeps the quality metrics consistent
            # across branches: the fused kernel parses (and averages
            # conf/snr over) exactly the frame's own symbols, while the
            # paths below demodulate every symbol present in samples_tm —
            # an oversized window would otherwise get different
            # confidence/snr depending on which branch dispatched
            # (payload/verdicts never differed). Oversized windows fall
            # through to decide_tones_tm.
            # Full fusion: the frame-parse epilogue (bit unpack, byte
            # pack, both CRC contractions) runs in the kernel tail; the
            # XLA tail below it touches only KB-scale tensors
            # (anet.kernels.decide_frame_tm — round 4, the ~2 ms/iter
            # epilogue residual of docs/PERF.md's roofline section).
            from anet.kernels import decide_frame_tm

            # Whole frames go in with the preamble offset folded into the
            # kernel's BlockSpec index map — slicing `data` here instead
            # fed the Pallas operand a materialized COPY of the data
            # section (~3.5 ms at B=16384, the round-5 headline
            # bisection; see decide_frame_tm's docstring).
            words, crc_counts, qual, n_sym = decide_frame_tm(
                config, samples_tm, payload_len,
                compute_dtype=compute_dtype, interpret=interpret,
                preamble_offset=pre,
            )
            return frame_result_from_packed(
                config, words, crc_counts, qual, n_sym, payload_len
            )
        from anet.kernels import decide_tones_tm

        tone, best, total = decide_tones_tm(
            config, data, compute_dtype=compute_dtype, interpret=interpret
        )
    # Quality metrics reduce over the symbol (major) axis while still
    # time-major; only [B]-vectors and the [S, B] decisions transpose.
    confidence = jnp.mean(best / jnp.maximum(total, 1e-20), axis=0)
    rest = (total - best) / (m - 1)
    sig = jnp.mean(best, axis=0)
    noise = jnp.maximum(jnp.mean(rest, axis=0), jnp.float32(1e-20))
    snr_db = 10.0 * jnp.log10(jnp.maximum(sig / noise - 1.0, jnp.float32(1e-6)))
    symbols = gray_decode(tone.T, config.bits_per_symbol)  # [B, S]
    bits = unpack_symbols(symbols, config.bits_per_symbol)
    return frame_result_from_bits(
        config, bits, payload_len, llrs=llrs, confidence=confidence, snr_db=snr_db
    )


def frame_result_from_tone_decisions(
    config: ModemConfig,
    tone: jnp.ndarray,
    best: jnp.ndarray,
    total: jnp.ndarray,
    payload_len: int,
) -> FrameResult:
    """Parse + verify from reduced decisions: winning tone index plus
    best/total energies, all [..., S] batch-major — the contract of the
    fused kernels (anet.kernels decide_tones_fused / demod_at_fused),
    which never materialize full energies. Same quality math as
    demodulate_frame_tm's tail; uncoded only (FEC soft decisions need
    full per-tone energies)."""
    from anet.dsp.bits import gray_decode

    if config.fec == "conv":
        raise ValueError("coded configs need full energies (use "
                         "frame_result_from_decisions)")
    m = config.num_tones
    confidence = jnp.mean(best / jnp.maximum(total, 1e-20), axis=-1)
    rest = (total - best) / (m - 1)
    sig = jnp.mean(best, axis=-1)
    noise = jnp.maximum(jnp.mean(rest, axis=-1), jnp.float32(1e-20))
    snr_db = 10.0 * jnp.log10(jnp.maximum(sig / noise - 1.0, jnp.float32(1e-6)))
    symbols = gray_decode(tone, config.bits_per_symbol)
    bits = unpack_symbols(symbols, config.bits_per_symbol)
    return frame_result_from_bits(
        config, bits, payload_len, confidence=confidence, snr_db=snr_db
    )


def frame_result_from_packed(
    config: ModemConfig,
    words: jnp.ndarray,
    crc_counts: jnp.ndarray,
    qual: jnp.ndarray,
    n_symbols: int,
    payload_len: int,
) -> FrameResult:
    """Parse + verify from the FULL-FUSION kernel's outputs
    (anet.kernels.decide_frame_tm): packed decision words [n_tiles, B]
    (TM_SYMBOL_TILE Gray-decoded symbols per int32, MSB-first), f32 CRC
    bit-count accumulators [64, B] (header in rows 0..31, payload in
    32..63; parity mod 2 here — counts < 2^24 so the f32 sums are exact),
    and quality sums [8, B] (conf/best/total in rows 0..2).

    Everything here runs on KB-scale tensors: the [S, B] decisions and
    the [B, 8N] bit tensor of the unfused parse never exist.
    """
    m = config.num_tones
    bps = config.bits_per_symbol
    from anet.kernels import TM_SYMBOL_TILE

    sb = TM_SYMBOL_TILE
    nb = sb * bps  # bits per word; whole bytes (bps in {1, 2, 4})
    n_bytes = data_section_bytes(payload_len)
    w = words.T  # [B, n_tiles] int32
    bpw = nb // 8  # bytes per word
    shifts = jnp.arange(bpw - 1, -1, -1, dtype=jnp.int32) * 8
    by = ((w[..., None] >> shifts) & 0xFF).astype(jnp.uint8)
    section = by.reshape(*w.shape[:-1], w.shape[-1] * bpw)[..., :n_bytes]

    magic = _be_bytes_to_u32(section[..., :4])
    length = _be16(section[..., 4:6])
    magic_ok = magic == jnp.uint32(constants.MAGIC_WORD)
    length_ok = length == jnp.uint32(payload_len)

    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    parity = crc_counts.T.astype(jnp.int32) & 1  # [B, 64]
    from anet.kernels import _frame_crc_tables

    _, c_hdr, c_pay = _frame_crc_tables(payload_len, words.shape[0], nb)
    hdr_raw = jnp.sum(
        parity[..., :32].astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32
    ) ^ jnp.uint32(c_hdr)
    pay_raw = jnp.sum(
        parity[..., 32:].astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32
    ) ^ jnp.uint32(c_pay)
    header_crc_ok = (hdr_raw & jnp.uint32(0xFFFF)) == _be16(section[..., 6:8])
    trailer = section[..., HEADER_BYTES + payload_len :]
    payload_crc_ok = pay_raw == _be_bytes_to_u32(trailer)

    qt = qual.T  # [B, 8]
    confidence = qt[..., 0] / n_symbols
    sig = qt[..., 1] / n_symbols
    noise = jnp.maximum((qt[..., 2] - qt[..., 1]) / n_symbols / (m - 1), 1e-20)
    snr_db = 10.0 * jnp.log10(jnp.maximum(sig / noise - 1.0, jnp.float32(1e-6)))

    ok = magic_ok & length_ok & header_crc_ok & payload_crc_ok
    return FrameResult(
        payload=section[..., HEADER_BYTES : HEADER_BYTES + payload_len],
        magic_ok=magic_ok,
        length_ok=length_ok,
        header_crc_ok=header_crc_ok,
        payload_crc_ok=payload_crc_ok,
        ok=ok,
        confidence=confidence,
        snr_db=snr_db,
    )


def frame_result_from_decisions(
    config: ModemConfig,
    symbols: jnp.ndarray,
    energies: jnp.ndarray,
    payload_len: int,
) -> FrameResult:
    """Parse + verify the data section from already-decided MFSK symbols.

    Shared tail of the block demodulator above and the clock-tracked
    demodulator (anet.dsp.clock): symbols/energies in, payload + verdicts
    out. Soft decisions for the FEC come from the filterbank energies.
    """
    bits = unpack_symbols(symbols, config.bits_per_symbol)
    llrs = None
    if config.fec == "conv":
        from anet.dsp.demod import bit_llrs

        llrs = bit_llrs(config, energies)
    best = jnp.max(energies, axis=-1)
    total = jnp.sum(energies, axis=-1)
    confidence = jnp.mean(best / jnp.maximum(total, 1e-20), axis=-1)
    snr_db = estimate_snr_db(config, energies)
    return frame_result_from_bits(
        config, bits, payload_len, llrs=llrs, confidence=confidence, snr_db=snr_db
    )


class DynamicFrameResult(NamedTuple):
    """Demodulated frame whose payload length came from the header.

    Shapes are static at the configured maximum; ``payload`` is zero-padded
    past ``payload_len``. The reference's wire protocol is length-prefixed
    the same way (varint-delimited, network.cpp:409-430) — the receiver
    learns each frame's size from the frame itself.
    """

    payload: jnp.ndarray  # uint8[..., max_payload_len], zero-padded
    payload_len: jnp.ndarray  # int32[...] header-declared length (clipped)
    magic_ok: jnp.ndarray  # bool[...]
    length_ok: jnp.ndarray  # bool[...] declared length <= configured max
    header_crc_ok: jnp.ndarray  # bool[...]
    payload_crc_ok: jnp.ndarray  # bool[...]
    ok: jnp.ndarray  # bool[...]
    confidence: jnp.ndarray  # float32[...]
    snr_db: jnp.ndarray  # float32[...]


def frame_result_from_bits_dynamic(
    config,
    bits: jnp.ndarray,
    max_payload_len: int,
    *,
    confidence: jnp.ndarray,
    snr_db: jnp.ndarray,
) -> DynamicFrameResult:
    """Variable-length frame parse: the payload length is read from the
    demodulated header instead of being supplied by the caller.

    TPU formulation: demodulate a max-length window (static shapes), parse
    the 2-byte length field, verify the payload CRC over exactly ``length``
    bytes with the masked-scan CRC, and gather the 4 trailer bytes at their
    dynamic offset. Uncoded (hard-decision) bits only; coded configs use
    frame_result_from_llrs_dynamic (the header probe + masked-trellis
    Viterbi), which calls the shared parse below.
    """
    if getattr(config, "fec", "none") != "none":
        raise ValueError(
            "hard-bit dynamic parse requires fec='none'; coded configs "
            "decode through frame_result_from_llrs_dynamic"
        )
    return _parse_dynamic_section(
        bits, max_payload_len, confidence=confidence, snr_db=snr_db
    )


HEADER_PROBE_DATA_BITS = 96  # header's 64 bits + 32 bits of traceback margin


def frame_result_from_llrs_dynamic(
    config,
    llrs: jnp.ndarray,
    max_payload_len: int,
    *,
    confidence: jnp.ndarray,
    snr_db: jnp.ndarray,
) -> DynamicFrameResult:
    """Variable-length CODED frame parse: soft LLRs for a max-length
    window in, payload + declared length out — the coded twin of
    frame_result_from_bits_dynamic, closing the round-4 capability hole
    (robust presets could not stream variable-length frames at all).

    The blocker was circular: the Viterbi trellis length depends on the
    payload length the header declares, and the header is itself inside
    the coded section. Two-stage decode breaks the circle — the
    reference's length-prefixed framing is the behavioral anchor
    (network.cpp:409-430: the frame tells the receiver its own size):

    1. **Header probe** (the 48-bit mini-Viterbi of the round-4 verdict,
       widened to the full 64-bit header): the convolutional code is
       sequential, so the first HEADER_PROBE_DATA_BITS data bits decode
       from the static LLR prefix alone — every frame (even payload 0)
       carries at least that many data bits, and the 32-bit margin past
       the header covers traceback convergence from an unflushed state.
    2. **Masked full trellis**: LLRs beyond the declared coded length are
       zeroed (a traced elementwise mask — no dynamic shapes), then ONE
       max-length Viterbi decodes the section. Zero LLRs tie every
       branch metric, so path metrics are frozen past the true tail
       flush: state 0 stays the strict minimum through the padded
       region, the traceback (which starts at state 0) rides it back to
       the true flush, and the decode of the REAL span is exactly the
       ML decode of the true-length trellis. A wrong probe length (noise)
       mis-masks the tail; the full decode's header+payload CRCs then
       reject the frame — the probe is only ever a mask hint, never an
       integrity input.

    Requires fec='conv' with fec_interleave == 1: a depth-d block
    interleaver's geometry (rows = ceil(coded_len / d)) depends on the
    total length, so the header's coded bits have no static positions to
    probe — a fundamentally length-coupled permutation, documented as the
    one dynamic-coded exclusion (the `mfsk4-coded-stream` preset is the
    interleave-free robust rung for variable-length streaming).
    """
    if getattr(config, "fec", "none") != "conv":
        raise ValueError("frame_result_from_llrs_dynamic needs fec='conv'")
    if config.fec_interleave > 1:
        raise ValueError(
            "dynamic coded frames need fec_interleave == 1: a block "
            "interleaver's geometry depends on the section length the "
            "header declares (use the mfsk4-coded-stream preset)"
        )
    from anet.dsp.fec import CONV_TAIL_BITS, conv_encoded_bits, viterbi_decode_soft

    # 1. header probe on the static prefix
    n_probe = HEADER_PROBE_DATA_BITS
    probe_bits = viterbi_decode_soft(llrs[..., : conv_encoded_bits(n_probe)], n_probe)
    probe_hdr = bits_to_bytes(probe_bits[..., : HEADER_BYTES * 8])
    probe_len = jnp.clip(
        _be16(probe_hdr[..., 4:6]), 0, max_payload_len
    ).astype(jnp.int32)

    # 2. masked max-length trellis (exact ML of the true-length decode)
    n_bytes_max = data_section_bytes(max_payload_len)
    coded_len = 2 * (
        8 * (OVERHEAD_BYTES + probe_len) + jnp.int32(CONV_TAIL_BITS)
    )
    lane = jnp.arange(llrs.shape[-1], dtype=jnp.int32)
    masked = jnp.where(lane < coded_len[..., None], llrs, 0.0)
    bits = viterbi_decode_soft(masked, 8 * n_bytes_max)
    return _parse_dynamic_section(
        bits, max_payload_len, confidence=confidence, snr_db=snr_db
    )


def _parse_dynamic_section(
    bits: jnp.ndarray,
    max_payload_len: int,
    *,
    confidence: jnp.ndarray,
    snr_db: jnp.ndarray,
) -> DynamicFrameResult:
    """Shared dynamic-length parse of decoded section bits (uncoded path
    and post-Viterbi coded path)."""
    n_bytes = data_section_bytes(max_payload_len)
    section = bits_to_bytes(bits[..., : n_bytes * 8])

    magic, length, header_crc_ok = _parse_header(section[..., :HEADER_BYTES])
    magic_ok = magic == jnp.uint32(constants.MAGIC_WORD)
    length_ok = length <= jnp.uint32(max_payload_len)
    plen = jnp.clip(length, 0, max_payload_len).astype(jnp.int32)

    body = section[..., HEADER_BYTES : HEADER_BYTES + max_payload_len]
    mask = jnp.arange(max_payload_len) < plen[..., None]
    payload = jnp.where(mask, body, jnp.uint8(0))
    crc_calc = crc32_device(body, length=plen)
    trailer_idx = HEADER_BYTES + plen[..., None] + jnp.arange(4)
    trailer = jnp.take_along_axis(section, trailer_idx, axis=-1)
    payload_crc_ok = crc_calc == _be_bytes_to_u32(trailer)

    ok = magic_ok & length_ok & header_crc_ok & payload_crc_ok
    return DynamicFrameResult(
        payload=payload,
        payload_len=plen,
        magic_ok=magic_ok,
        length_ok=length_ok,
        header_crc_ok=header_crc_ok,
        payload_crc_ok=payload_crc_ok,
        ok=ok,
        confidence=confidence,
        snr_db=snr_db,
    )


def dynamic_frame_result_from_tone_decisions(
    config: ModemConfig,
    tone: jnp.ndarray,
    best: jnp.ndarray,
    total: jnp.ndarray,
    max_payload_len: int,
) -> DynamicFrameResult:
    """Variable-length parse from reduced decisions — the dynamic twin of
    frame_result_from_tone_decisions, consuming the fused kernels'
    (tone, best, total) contract (anet.kernels.demod_at_fused) so the
    streaming receiver's dynamic path can skip the aligned gather too.

    Quality metrics use only the overhead-symbol span (the only span
    guaranteed to carry signal at any payload length), with the same
    numerics as demodulate_frame_dynamic's estimate_snr_db tail.
    """
    from anet.dsp.bits import gray_decode

    if getattr(config, "fec", "none") != "none":
        raise ValueError("dynamic payload length requires fec='none'")
    m = config.num_tones
    s_min = data_symbols_for_payload(config, 0)  # overhead-only span
    b = best[..., :s_min]
    t = total[..., :s_min]
    confidence = jnp.mean(b / jnp.maximum(t, 1e-20), axis=-1)
    rest = (t - b) / (m - 1)
    sig = jnp.mean(b, axis=-1)
    noise = jnp.maximum(jnp.mean(rest, axis=-1), jnp.float32(1e-20))
    snr_db = 10.0 * jnp.log10(jnp.maximum(sig / noise - 1.0, jnp.float32(1e-6)))
    symbols = gray_decode(tone, config.bits_per_symbol)
    bits = unpack_symbols(symbols, config.bits_per_symbol)
    return frame_result_from_bits_dynamic(
        config, bits, max_payload_len, confidence=confidence, snr_db=snr_db
    )


def dynamic_frame_result_from_energies(
    config: ModemConfig,
    energies: jnp.ndarray,
    max_payload_len: int,
) -> DynamicFrameResult:
    """Variable-length CODED parse from full tone energies [..., S, M] —
    the streaming receiver's coded-dynamic tail: soft LLRs feed the header
    probe + masked-trellis Viterbi (frame_result_from_llrs_dynamic), and
    quality metrics use the overhead-symbol span exactly like the uncoded
    dynamic paths. This is what demod_at_energies_fused's output plugs
    into (the aligned max-length frame never exists in HBM)."""
    from anet.dsp.demod import bit_llrs

    s_min = data_symbols_for_payload(config, 0)
    e = energies[..., :s_min, :]
    best = jnp.max(e, axis=-1)
    total = jnp.sum(e, axis=-1)
    confidence = jnp.mean(best / jnp.maximum(total, 1e-20), axis=-1)
    snr_db = estimate_snr_db(config, e)
    llrs = bit_llrs(config, energies)[
        ..., : data_section_coded_bits(config, max_payload_len)
    ]
    return frame_result_from_llrs_dynamic(
        config, llrs, max_payload_len, confidence=confidence, snr_db=snr_db
    )


def demodulate_frame_dynamic(
    config: ModemConfig,
    samples: jnp.ndarray,
    max_payload_len: int,
    *,
    compute_dtype=jnp.float32,
) -> DynamicFrameResult:
    """Symbol-aligned max-length frame window -> payload + declared length.

    ``samples`` must be frame_num_samples(config, max_payload_len) long;
    captures holding a shorter frame just include trailing noise, which the
    masked CRC ignores. Quality metrics (confidence, SNR) are computed over
    the overhead symbols — the only span guaranteed to carry signal at any
    payload length.
    """
    sps = config.samples_per_symbol
    data = samples[..., config.preamble_symbols * sps :]
    energies = tone_energies(config, data, compute_dtype=compute_dtype)
    s_min = data_symbols_for_payload(config, 0)  # overhead-only span
    e = energies[..., :s_min, :]
    best = jnp.max(e, axis=-1)
    total = jnp.sum(e, axis=-1)
    confidence = jnp.mean(best / jnp.maximum(total, 1e-20), axis=-1)
    snr_db = estimate_snr_db(config, e)
    if getattr(config, "fec", "none") == "conv":
        from anet.dsp.demod import bit_llrs

        llrs = bit_llrs(config, energies)[
            ..., : data_section_coded_bits(config, max_payload_len)
        ]
        return frame_result_from_llrs_dynamic(
            config, llrs, max_payload_len, confidence=confidence, snr_db=snr_db
        )
    symbols = decide_symbols(config, energies)
    bits = unpack_symbols(symbols, config.bits_per_symbol)
    return frame_result_from_bits_dynamic(
        config, bits, max_payload_len, confidence=confidence, snr_db=snr_db
    )


def dynamic_frame_samples(config, payload_len) -> jnp.ndarray:
    """frame_num_samples with a runtime (traced) payload length.

    Works for both families; used by the streaming receiver to advance its
    dedupe cursor past exactly the frame it just decoded. Also accepts a
    plain Python int (the CLI derives its frames-per-chunk default from
    the minimum frame length).
    """
    n_bits = 8 * (OVERHEAD_BYTES + jnp.asarray(payload_len).astype(jnp.int32))
    from anet.dsp.family import is_ofdm

    if getattr(config, "fec", "none") == "conv":
        # air bits after rate-1/2 coding + tail flush (the dynamic coded
        # path requires fec_interleave == 1, so no interleaver pad term —
        # mirrors coded_bits_for_data_bits for that geometry)
        from anet.dsp.fec import CONV_TAIL_BITS

        n_bits = 2 * (n_bits + CONV_TAIL_BITS)
    syms = (n_bits + config.bits_per_symbol - 1) // config.bits_per_symbol
    if is_ofdm(config):
        return config.preamble_samples + (1 + syms) * config.symbol_samples
    return (config.preamble_symbols + syms) * config.samples_per_symbol


def frame_result_from_bits(
    config,
    bits: jnp.ndarray,
    payload_len: int,
    *,
    llrs: jnp.ndarray | None = None,
    confidence: jnp.ndarray,
    snr_db: jnp.ndarray,
) -> FrameResult:
    """Modulation-agnostic frame parse: demodulated bits (and optionally
    per-bit LLRs for soft FEC) -> payload + verdicts.

    ``config`` only needs the FEC surface (``fec``, ``fec_interleave``,
    ``coded_bits_for_data_bits``), so any modulation family — MFSK, OFDM —
    shares the header/CRC/FEC machinery.
    """
    n_bytes = data_section_bytes(payload_len)
    if config.fec == "conv":
        from anet.dsp.fec import conv_encoded_bits, deinterleave, viterbi_decode_soft

        # the deinterleaver permutes LLRs identically to hard bits; fall
        # back to +-1 soft values when the caller has only hard decisions
        soft = llrs if llrs is not None else bits.astype(jnp.float32) * 2.0 - 1.0
        air = soft[..., : data_section_coded_bits(config, payload_len)]
        coded = deinterleave(air, config.fec_interleave, conv_encoded_bits(8 * n_bytes))
        bits = viterbi_decode_soft(coded, 8 * n_bytes)
    section = bits_to_bytes(bits[..., : n_bytes * 8])

    payload = section[..., HEADER_BYTES : HEADER_BYTES + payload_len]
    trailer = section[..., HEADER_BYTES + payload_len :]

    magic, length, header_crc_ok = _parse_header(section[..., :HEADER_BYTES])
    magic_ok = magic == jnp.uint32(constants.MAGIC_WORD)
    length_ok = length == jnp.uint32(payload_len)
    payload_crc_ok = crc32_device(payload) == _be_bytes_to_u32(trailer)
    ok = magic_ok & length_ok & header_crc_ok & payload_crc_ok
    return FrameResult(
        payload=payload,
        magic_ok=magic_ok,
        length_ok=length_ok,
        header_crc_ok=header_crc_ok,
        payload_crc_ok=payload_crc_ok,
        ok=ok,
        confidence=confidence,
        snr_db=snr_db,
    )
