"""Frame integrity: CRC-32 on host and on device.

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
    if length is None:
        length = jnp.full(batch_shape, n, dtype=jnp.int32)

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
