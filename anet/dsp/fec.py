"""Forward error correction: CRC-32 + rate-1/2 convolutional code.

CRC-32 (integrity) on host and on device; an optional K=7 rate-1/2
convolutional code (polynomials 0o171/0o133 — the classic CCSDS/Voyager
code) with a fully batched Viterbi decoder for ~5 dB of coding gain on
noisy acoustic channels. The reference has no FEC (Opus tolerates loss;
the PHY was WiFi) — this is a designed-in capability of the modem.

Polynomial/parameters match zlib's CRC-32 (reflected 0xEDB88320, init and
xor-out 0xFFFFFFFF) so host-side checks can use the stdlib and golden tests
can cross-validate the device implementation against it.

Device formulation: the bytewise table recurrence runs as a `lax.scan` over
the byte axis with a 256-entry gather per step — compiler-friendly control
flow, static shapes, and masking support for padded frames (the
padding+masking discipline SURVEY.md §7.3 calls for).
"""

from __future__ import annotations

import zlib
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def crc32_host(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF


@lru_cache(maxsize=1)
def _crc32_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table[i] = c
    return table


def crc32_device(data: jnp.ndarray, length: jnp.ndarray | None = None) -> jnp.ndarray:
    """CRC-32 of uint8[..., N] along the last axis.

    Two formulations:
    - ``length is None`` (static length — the framing hot path): CRC-32 is
      linear over GF(2), so the whole checksum is one bit-matrix product:
      crc = (bits @ P_N) mod 2 ^ crc(0^N), with P_N the precomputed
      per-position bit-contribution table. No sequential scan at all — the
      check runs on the MXU alongside the demod matmul.
    - ``length`` given (runtime-variable length): the classic bytewise
      table recurrence as a masked `lax.scan` over the byte axis.

    Args:
      data: uint8 bytes, any leading batch shape.
      length: optional int array (batch shape) — only the first ``length``
        bytes contribute; trailing padding is masked out so fixed-shape
        padded frames check correctly.
    Returns:
      uint32 CRC, shape = data.shape[:-1].
    """
    if length is None:
        return _crc32_matmul(data)
    table = jnp.asarray(_crc32_table())
    n = data.shape[-1]
    batch_shape = data.shape[:-1]
    init = jnp.full(batch_shape, 0xFFFFFFFF, dtype=jnp.uint32)

    def step(state, inputs):
        byte, idx = inputs
        lookup = table[((state ^ byte.astype(jnp.uint32)) & 0xFF).astype(jnp.int32)]
        nxt = lookup ^ (state >> 8)
        state = jnp.where(idx < length, nxt, state)
        return state, None

    # scan over the byte axis (time-major), batched over leading axes
    bytes_tm = jnp.moveaxis(data, -1, 0)  # [N, ...]
    idxs = jnp.arange(n, dtype=jnp.int32)
    final, _ = jax.lax.scan(step, init, (bytes_tm, idxs))
    return final ^ jnp.uint32(0xFFFFFFFF)


def crc32_bytes_be(crc: int) -> bytes:
    return int(crc).to_bytes(4, "big")


# --- matmul formulation (static length) --------------------------------------

@lru_cache(maxsize=64)
def _crc32_bit_table(n_bytes: int) -> tuple[np.ndarray, int]:
    """(P, const) for the linear CRC formulation over an n-byte message.

    P[j, b] = bit b of the CRC contribution of message bit j (MSB-first
    within each byte, matching anet.dsp.bits.bytes_to_bits), computed with
    zero init and no xor-out; const = crc32 of the all-zero message (which
    absorbs the 0xFFFFFFFF init and xor-out affine parts).

    Columns are built back-to-front: the contribution of a bit one byte
    earlier is its successor's state advanced through one zero byte
    (s -> table[s & 0xFF] ^ (s >> 8)) — O(8 N) host work, cached per length.
    """
    table = _crc32_table()
    cols = np.zeros((n_bytes, 8), dtype=np.uint64)
    if n_bytes:
        # Last byte position: raw-state CRC (init 0, no xorout) of 1-byte
        # messages with a single bit set. raw0(m) = ~zlib.crc32(m, 0xFFFFFFFF).
        for k in range(8):
            msg = bytes([0x80 >> k])
            cols[n_bytes - 1, k] = (~zlib.crc32(msg, 0xFFFFFFFF)) & 0xFFFFFFFF
        for i in range(n_bytes - 2, -1, -1):
            s = cols[i + 1]
            cols[i] = table[(s & 0xFF).astype(np.int64)] ^ (s >> 8)
    # Expand to a [8N, 32] 0/1 matrix.
    flat = cols.reshape(-1)  # [8N], bit j of byte-major MSB-first order
    bitpos = np.arange(32, dtype=np.uint64)
    p = ((flat[:, None] >> bitpos[None, :]) & 1).astype(np.float32)  # [8N, 32]
    const = zlib.crc32(b"\x00" * n_bytes) & 0xFFFFFFFF
    return p, const


# --- block interleaver --------------------------------------------------------


def interleaved_bits(n_bits: int, depth: int) -> int:
    """On-air bit count after padding to a whole depth x rows block."""
    if depth <= 1:
        return n_bits
    rows = -(-n_bits // depth)
    return rows * depth


def interleave(bits: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Rectangular block interleaver: [..., n] -> [..., rows*depth].

    Written row-major, read column-major, zero-padded to a full block.
    Consecutive on-air bits land exactly `depth` apart after
    deinterleaving (and a burst of up to `rows` = ceil(n/depth) on-air
    bits is fully dispersed), so channel bursts become isolated single
    errors — exactly what the convolutional decoder can fix (plain
    convolutional codes die on bursts longer than a constraint length).
    Choose depth > the K=7 constraint length; larger depths disperse
    longer bursts at no cost.
    """
    if depth <= 1:
        return bits
    n = bits.shape[-1]
    rows = -(-n // depth)
    pad = rows * depth - n
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1
        )
    block = bits.reshape(*bits.shape[:-1], rows, depth)
    return jnp.swapaxes(block, -1, -2).reshape(*bits.shape[:-1], rows * depth)


def deinterleave(bits: jnp.ndarray, depth: int, n_bits: int) -> jnp.ndarray:
    """Inverse of interleave; returns the first ``n_bits`` (pad dropped).

    Works on hard bits and on float LLRs alike (pure permutation).
    """
    if depth <= 1:
        return bits[..., :n_bits]
    total = bits.shape[-1]
    rows = total // depth
    block = bits.reshape(*bits.shape[:-1], depth, rows)
    out = jnp.swapaxes(block, -1, -2).reshape(*bits.shape[:-1], total)
    return out[..., :n_bits]


# --- rate-1/2 K=7 convolutional code -----------------------------------------

CONV_K = 7
CONV_POLY1 = 0o171  # 1111001
CONV_POLY2 = 0o133  # 1011011
CONV_STATES = 1 << (CONV_K - 1)  # 64
CONV_TAIL_BITS = CONV_K - 1  # zero-flush so the trellis ends in state 0


def conv_encoded_bits(n_data_bits: int) -> int:
    """Coded length for a data-bit count (tail-flushed, rate 1/2)."""
    return 2 * (n_data_bits + CONV_TAIL_BITS)


@lru_cache(maxsize=1)
def _conv_tables():
    """(outputs[64, 2, 2], predecessors[64, 2]) transition tables.

    outputs[s, b] = the two coded bits emitted when input bit ``b`` enters
    with shift-register state ``s`` (the last K-1 input bits, newest in the
    LSB). predecessors[ns, j] = the two states that can transition into
    ``ns`` (its input bit is ns & 1 by construction).
    """
    outputs = np.zeros((CONV_STATES, 2, 2), np.int32)
    for s in range(CONV_STATES):
        for b in range(2):
            reg = (s << 1) | b  # K bits: state history + new bit
            outputs[s, b, 0] = bin(reg & CONV_POLY1).count("1") & 1
            outputs[s, b, 1] = bin(reg & CONV_POLY2).count("1") & 1
    preds = np.zeros((CONV_STATES, 2), np.int32)
    for ns in range(CONV_STATES):
        # ns = ((s << 1) | b) & 63  =>  s = (ns >> 1) | (h << 5), h in {0,1}
        preds[ns, 0] = ns >> 1
        preds[ns, 1] = (ns >> 1) | (1 << (CONV_K - 2))
    return outputs, preds


def conv_encode(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 uint8 [..., n] -> coded 0/1 uint8 [..., 2*(n + 6)].

    Vectorized (no scan): each output bit is the parity of a 7-bit sliding
    window AND'ed with the polynomial — seven shifted adds mod 2.
    """
    n = bits.shape[-1]
    padded = jnp.concatenate(
        [
            jnp.zeros(bits.shape[:-1] + (CONV_K - 1,), bits.dtype),
            bits,
            jnp.zeros(bits.shape[:-1] + (CONV_TAIL_BITS,), bits.dtype),
        ],
        axis=-1,
    ).astype(jnp.int32)
    total = n + CONV_TAIL_BITS
    # window[i, k] = padded[i + k], k = 0..6 (oldest..newest)
    idx = jnp.arange(total)[:, None] + jnp.arange(CONV_K)[None, :]
    windows = padded[..., idx]  # [..., total, 7]
    # polynomial taps, MSB of the register = oldest bit
    taps1 = jnp.asarray(
        [(CONV_POLY1 >> (CONV_K - 1 - k)) & 1 for k in range(CONV_K)], jnp.int32
    )
    taps2 = jnp.asarray(
        [(CONV_POLY2 >> (CONV_K - 1 - k)) & 1 for k in range(CONV_K)], jnp.int32
    )
    c1 = jnp.sum(windows * taps1, axis=-1) & 1
    c2 = jnp.sum(windows * taps2, axis=-1) & 1
    out = jnp.stack([c1, c2], axis=-1)  # [..., total, 2]
    return out.reshape(*bits.shape[:-1], 2 * total).astype(jnp.uint8)


def viterbi_decode(coded: jnp.ndarray, n_data_bits: int, **kw) -> jnp.ndarray:
    """Hard-decision Viterbi: coded 0/1 [..., 2*(n+6)] -> 0/1 [..., n].

    Batched add-compare-select over the 64-state trellis; thousands of
    streams decode concurrently. See _viterbi for the layout design and
    the Pallas/jnp dispatch (kwargs pass through).
    """
    return _viterbi(coded.astype(jnp.float32) * 2.0 - 1.0, n_data_bits, **kw)


def viterbi_decode_soft(llrs: jnp.ndarray, n_data_bits: int, **kw) -> jnp.ndarray:
    """Soft-decision Viterbi: per-coded-bit LLRs [..., 2*(n+6)] -> bits.

    ``llrs`` positive = bit 1 (anet.dsp.demod.bit_llrs convention). Soft
    metrics buy ~1.5-2 dB over hard decisions on this channel.
    """
    return _viterbi(llrs.astype(jnp.float32), n_data_bits, **kw)


@lru_cache(maxsize=1)
def _branch_signs() -> np.ndarray:
    """[64, 4] per-state +-1 branch-metric signs for the Pallas kernel:
    columns are (-e[j=0,bit0], -e[j=0,bit1], -e[j=1,bit0], -e[j=1,bit1])
    where e is the signed expected coded pair of the transition into each
    state (bm_j = signs . rx, matching the jnp path's -correlation)."""
    outputs_np, preds_np = _conv_tables()
    ns_arr = np.arange(CONV_STATES)
    exp = np.zeros((CONV_STATES, 2, 2), np.int32)
    for ns in ns_arr:
        for j in range(2):
            exp[ns, j] = outputs_np[preds_np[ns, j], ns_arr[ns] & 1]
    e = (2 * exp - 1).astype(np.float32)  # [64, j, pair]
    return -e.reshape(CONV_STATES, 4)


def _viterbi(
    soft: jnp.ndarray,
    n_data_bits: int,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Shared trellis search; ``soft`` is signed (+ = bit 1) per coded bit.

    ``use_pallas=None`` auto-selects: the fused VMEM-resident kernel pair
    (anet.kernels.viterbi_trellis) on TPU, the jnp scan elsewhere.

    STATE-MAJOR formulation, designed for the TPU memory layout: path
    metrics live as ``[64 states, N streams]`` with states in the
    SUBLANE axis and the batch in lanes. That makes every per-step op
    either pure elementwise [64, N] VPU work or a static major-axis
    index:

    - ``preds[ns, j]`` has the closed form ``(ns >> 1) | (j << 5)``, so
      the forward gather ``pm[preds[:, j]]`` is indexing with a
      *constant* sublane permutation (a copy, not a gather), and the
      traceback predecessor is integer arithmetic — no gather at all.
    - The traceback's per-stream decision lookup (the old layout's
      ``take_along_axis`` over the minor axis — a scalar-core gather on
      TPU, the same ~0.2 GB/s pathology docs/PERF.md measured in the
      stream receiver) becomes a one-hot mask + sublane sum.

    Measured on chip (mfsk4-coded, B=4096): see docs/PERF.md coded rows.
    """
    # Branch-metric table, derived from the SAME signs the Pallas kernel
    # uses (_branch_signs) so the two paths can never desynchronize:
    # e[ns, j] is the signed expected coded pair of the transition into
    # ns via predecessor j, and signs = -e.reshape(64, 4).
    e = jnp.asarray(-_branch_signs().reshape(CONV_STATES, 2, 2))
    ns_arr = np.arange(CONV_STATES)
    idx0 = jnp.asarray(ns_arr >> 1)  # preds[:, 0] — static permutation
    idx1 = jnp.asarray((ns_arr >> 1) | (1 << (CONV_K - 2)))  # preds[:, 1]

    batch_shape = soft.shape[:-1]
    total = n_data_bits + CONV_TAIL_BITS
    pairs = soft[..., : 2 * total].reshape(-1, total, 2)  # [N, total, 2]
    n = pairs.shape[0]
    rx_tm = jnp.moveaxis(pairs, 0, -1)  # [total, 2, N]

    if use_pallas is None:
        # On TPU the fused kernel pair wins outright and is bit-exact
        # against the scan (8.9 vs 15.0 ms at B=4096, 30 vs 43 ms at
        # B=16384 on a v5e); elsewhere the jnp scan is primary and the
        # kernel remains testable via interpret=True.
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas or interpret:
        from anet.kernels import viterbi_trellis

        bits_tm = viterbi_trellis(
            jnp.asarray(_branch_signs()),
            rx_tm.astype(jnp.float32),
            interpret=interpret,
        )  # [total, N] int32
        bits = jnp.moveaxis(bits_tm.astype(jnp.uint8), 0, -1).reshape(
            *batch_shape, total
        )
        return bits[..., :n_data_bits]

    big = jnp.float32(1e9)
    pm0 = jnp.full((CONV_STATES, n), big, jnp.float32).at[0].set(0.0)

    def forward(pm, rx):
        # rx: [2, N] signed soft pair; branch metric = negative
        # correlation with each transition's expected +-1 pair.
        bm0 = -(e[:, 0, 0, None] * rx[0] + e[:, 0, 1, None] * rx[1])  # [64, N]
        bm1 = -(e[:, 1, 0, None] * rx[0] + e[:, 1, 1, None] * rx[1])
        cand0 = pm[idx0] + bm0
        cand1 = pm[idx1] + bm1
        take = cand1 < cand0  # ties -> j=0, matching argmin's first-wins
        # No per-step normalization: subtracting a constant never changes
        # an argmin, and f32 holds the unnormalized metrics with room to
        # spare (|bm| per step is O(|llr|), so |pm| stays < ~1e6 over the
        # longest frame vs f32's 3e38 range and 7-digit mantissa).
        return jnp.minimum(cand0, cand1), take

    _, decisions = jax.lax.scan(forward, pm0, rx_tm)  # [total, 64, N] bool

    # traceback from state 0 (tail-flushed)
    s0 = jnp.zeros((n,), jnp.int32)
    states = jnp.arange(CONV_STATES, dtype=jnp.int32)

    def backward(s, take_t):
        bit = (s & 1).astype(jnp.uint8)
        # decision of the surviving state: one-hot sublane reduction
        j = jnp.sum(
            jnp.where(states[:, None] == s[None, :], take_t, False),
            axis=0,
        ).astype(jnp.int32)
        prev = (s >> 1) | (j << (CONV_K - 2))  # preds[s, j], closed form
        return prev, bit

    _, bits_rev = jax.lax.scan(backward, s0, decisions, reverse=True)
    bits = jnp.moveaxis(bits_rev, 0, -1).reshape(*batch_shape, total)
    return bits[..., :n_data_bits]


def _crc32_matmul(data: jnp.ndarray) -> jnp.ndarray:
    """One-matmul CRC-32 for static-length messages (see crc32_device)."""
    from anet.dsp.bits import bytes_to_bits

    n = data.shape[-1]
    p_np, const = _crc32_bit_table(n)
    if n == 0:
        return jnp.full(data.shape[:-1], const, dtype=jnp.uint32)
    bits = bytes_to_bits(data).astype(jnp.float32)  # [..., 8N]
    p = jnp.asarray(p_np)  # [8N, 32]
    counts = jnp.matmul(bits, p, preferred_element_type=jnp.float32)  # [..., 32]
    parity = counts.astype(jnp.int32) & 1  # exact: counts <= 8N < 2^24
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    raw = jnp.sum(parity.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32)
    return raw ^ jnp.uint32(const)
