"""Bit/byte/symbol packing utilities (pure jnp, static shapes).

Conventions (fixed so all implementations agree):
- Bytes unpack MSB-first (bit 7 first), matching how the bytes appear in a
  hex dump left-to-right.
- Symbols pack bits MSB-first: for bits_per_symbol=4, bits [b3 b2 b1 b0]
  form symbol value b3*8 + b2*4 + b1*2 + b0.
- Symbols are Gray-coded onto tone indices so adjacent-tone demod errors
  cost one bit, the standard MFSK mapping.
"""

from __future__ import annotations

import jax.numpy as jnp


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., N] -> uint8[..., N*8] of 0/1, MSB-first per byte."""
    data = data.astype(jnp.uint8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., N*8] of 0/1 -> uint8[..., N], MSB-first per byte."""
    n_bytes = bits.shape[-1] // 8
    grouped = bits.reshape(*bits.shape[:-1], n_bytes, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(grouped * weights, axis=-1, dtype=jnp.uint8)


def pack_symbols(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """0/1 bits[..., S*k] -> int32 symbols[..., S], MSB-first within a symbol.

    The bit count must already be a multiple of bits_per_symbol (frame
    builders pad with zero bits, mirroring the reference encoder's tail
    zero-pad semantics, OpusEncoder.kt:116-127).
    """
    s = bits.shape[-1] // bits_per_symbol
    grouped = bits.reshape(*bits.shape[:-1], s, bits_per_symbol).astype(jnp.int32)
    weights = jnp.left_shift(1, jnp.arange(bits_per_symbol - 1, -1, -1, dtype=jnp.int32))
    return jnp.sum(grouped * weights, axis=-1)


def unpack_symbols(symbols: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """int symbols[..., S] -> 0/1 uint8 bits[..., S*k], MSB-first."""
    shifts = jnp.arange(bits_per_symbol - 1, -1, -1, dtype=jnp.int32)
    bits = (symbols[..., :, None] >> shifts) & 1
    return bits.reshape(*symbols.shape[:-1], symbols.shape[-1] * bits_per_symbol).astype(
        jnp.uint8
    )


def gray_encode(value: jnp.ndarray) -> jnp.ndarray:
    """Binary -> Gray: g = b ^ (b >> 1)."""
    return value ^ (value >> 1)


def gray_decode(gray: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Gray -> binary via log2 prefix-XOR steps (static unrolled loop)."""
    value = gray
    shift = 1
    while shift < bits_per_symbol:
        value = value ^ (value >> shift)
        shift <<= 1
    return value
