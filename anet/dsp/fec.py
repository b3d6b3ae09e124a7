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

    Args:
      data: uint8 bytes, any leading batch shape.
      length: optional int array (batch shape) — only the first ``length``
        bytes contribute; trailing padding is masked out so fixed-shape
        padded frames check correctly.
    Returns:
      uint32 CRC, shape = data.shape[:-1].
    """
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
