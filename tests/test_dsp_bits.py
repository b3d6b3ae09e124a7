"""Unit tests for bit/byte/symbol packing and CRC (golden vs stdlib)."""

import numpy as np
import jax.numpy as jnp
import pytest

from anet.dsp.bits import (
    bits_to_bytes,
    bytes_to_bits,
    gray_decode,
    gray_encode,
    pack_symbols,
    unpack_symbols,
)
from anet.dsp.fec import crc32_device, crc32_host


def test_bytes_bits_roundtrip():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, size=(3, 17), dtype=np.uint8))
    bits = bytes_to_bits(data)
    assert bits.shape == (3, 17 * 8)
    assert set(np.unique(np.asarray(bits))) <= {0, 1}
    assert np.array_equal(np.asarray(bits_to_bytes(bits)), np.asarray(data))


def test_bits_msb_first():
    bits = bytes_to_bits(jnp.asarray([0b10000001], dtype=jnp.uint8))
    assert np.asarray(bits).tolist() == [1, 0, 0, 0, 0, 0, 0, 1]


@pytest.mark.parametrize("bps", [1, 2, 3, 4])
def test_symbol_pack_roundtrip(bps):
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, size=(2, 12 * bps), dtype=np.uint8))
    syms = pack_symbols(bits, bps)
    assert int(np.max(np.asarray(syms))) < (1 << bps)
    assert np.array_equal(np.asarray(unpack_symbols(syms, bps)), np.asarray(bits))


@pytest.mark.parametrize("bps", [1, 2, 3, 4, 5])
def test_gray_roundtrip_and_adjacency(bps):
    vals = jnp.arange(1 << bps)
    gray = gray_encode(vals)
    # bijection and inverse
    assert len(set(np.asarray(gray).tolist())) == 1 << bps
    assert np.array_equal(np.asarray(gray_decode(gray, bps)), np.asarray(vals))
    # adjacent values differ by exactly one bit in Gray space
    g = np.asarray(gray)
    for i in range(len(g) - 1):
        assert bin(int(g[i]) ^ int(g[i + 1])).count("1") == 1


def test_crc32_matches_zlib():
    rng = np.random.default_rng(2)
    for n in (0, 1, 7, 64, 300):
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        dev = int(crc32_device(jnp.asarray(data)))
        host = crc32_host(data.tobytes())
        assert dev == host, f"n={n}: {dev:#x} != {host:#x}"


def test_crc32_batched_and_masked():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=(4, 50), dtype=np.uint8)
    lengths = np.asarray([0, 10, 49, 50])
    crcs = crc32_device(jnp.asarray(data), jnp.asarray(lengths))
    for i, ln in enumerate(lengths):
        assert int(crcs[i]) == crc32_host(data[i, :ln].tobytes())
