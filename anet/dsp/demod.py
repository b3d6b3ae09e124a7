"""MFSK demodulator: waveform -> tone energies -> symbols (MXU-formulated).

The reference receiver's DSP hot loop is a per-frame Opus decode on a DSP
core (playback.cpp:118). Here the receive DSP is a tone-detector filterbank.
The classic embedded formulation is Goertzel's algorithm — a 2-tap IIR per
tone, sequential in time. That shape is hostile to a TPU; the
mathematically identical quantity (single-bin DFT energy over a symbol
window) is a matrix product:

    energies[s, m] = (x_s . cos_m)^2 + (x_s . sin_m)^2

i.e. one [S, sps] x [sps, 2M] matmul followed by a square-and-add — exactly
what the MXU is built for, and what anet.kernels fuses into a single Pallas
kernel (windowing + matmul + magnitude) for the benchmark path.

With orthogonal tone spacing the basis columns are orthogonal over a symbol
window, so inter-tone leakage is zero at perfect timing.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from anet.dsp.bits import gray_decode
from anet.dsp.params import ModemConfig


def demod_basis(config: ModemConfig, dtype=jnp.float32) -> jnp.ndarray:
    """The filterbank basis: [samples_per_symbol, 2 * num_tones].

    Columns 0..M-1 are cos(2*pi*f_m*t), columns M..2M-1 are sin(2*pi*f_m*t).
    Computed at trace time from the static config; XLA constant-folds it.

    The phases are ALWAYS computed in float32 and only the final basis is
    rounded to ``dtype``: phase values reach ~1e2 radians, so a bfloat16
    phase carries up to ~0.5 rad of error and cos() of it is garbage —
    measured on chip as 88% of bf16 basis entries off (max 0.71 on a
    ±1-scale table) whenever XLA compiled the bf16 arithmetic literally,
    i.e. a ~4% energy bias in every jitted bf16 demod. (Eagerly the
    constant-folder kept excess precision, which is how it hid.)
    """
    sps = config.samples_per_symbol
    t = jnp.arange(sps, dtype=jnp.float32)[:, None] / config.sample_rate_hz
    freqs = jnp.asarray(config.tone_freqs_hz, jnp.float32)[None, :]  # [1, M]
    phase = 2.0 * jnp.pi * freqs * t  # [sps, M]
    basis = jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=1)
    return basis.astype(dtype)


def tone_energies(
    config: ModemConfig,
    samples: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-symbol per-tone energies.

    Args:
      samples: float [..., S * samples_per_symbol] — symbol-aligned waveform.
      compute_dtype: matmul input dtype. bfloat16 halves HBM traffic and
        doubles MXU rate; accumulation stays float32 via
        preferred_element_type. BER impact is measured in tests/benchmarks.
    Returns:
      float32 [..., S, num_tones].
    """
    sps = config.samples_per_symbol
    m = config.num_tones
    s = samples.shape[-1] // sps
    windows = samples.reshape(*samples.shape[:-1], s, sps).astype(compute_dtype)
    basis = demod_basis(config, dtype=compute_dtype)
    iq = jnp.matmul(
        windows, basis, preferred_element_type=jnp.float32
    )  # [..., S, 2M] — the MXU hot op
    i, q = iq[..., :m], iq[..., m:]
    return i * i + q * q


def decide_symbols(config: ModemConfig, energies: jnp.ndarray) -> jnp.ndarray:
    """Hard decision: argmax tone, Gray-decoded back to data symbols."""
    tone = jnp.argmax(energies, axis=-1).astype(jnp.int32)
    return gray_decode(tone, config.bits_per_symbol)


def demodulate_symbols(
    config: ModemConfig,
    samples: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform -> (data symbols, soft metrics).

    The soft metric per symbol is the energy ratio of the winning tone to
    the total — a normalized confidence in (0, 1], used for the receiver's
    quality feedback (the ReceiverError analog, SURVEY.md §5 failure
    detection).
    """
    energies = tone_energies(config, samples, compute_dtype=compute_dtype)
    symbols = decide_symbols(config, energies)
    best = jnp.max(energies, axis=-1)
    total = jnp.sum(energies, axis=-1)
    confidence = best / jnp.maximum(total, jnp.float32(1e-20))
    return symbols, confidence


def bit_llrs(config: ModemConfig, energies: jnp.ndarray) -> jnp.ndarray:
    """Per-bit soft decisions from tone energies (max-log approximation).

    For data bit k of a symbol (MSB-first, matching unpack_symbols), the
    LLR is max(E over tones whose Gray-decoded value has bit k = 1) minus
    max(E over tones with bit k = 0). Positive = bit 1. Unnormalized —
    Viterbi branch metrics only need relative scale.

    Args:
      energies: float [..., S, M].
    Returns:
      float32 [..., S * bits_per_symbol] in transmitted bit order.
    """
    m = config.num_tones
    bps = config.bits_per_symbol
    tones = jnp.arange(m)
    data_vals = gray_decode(tones, bps)  # data symbol carried by each tone
    shifts = jnp.arange(bps - 1, -1, -1)
    bit_of_tone = ((data_vals[:, None] >> shifts[None, :]) & 1).astype(bool)  # [M, bps]

    neg_inf = jnp.float32(-jnp.inf)
    # mask per bit: [..., S, M, bps]
    e_b = jnp.broadcast_to(energies[..., None], energies.shape + (bps,))
    max_one = jnp.max(jnp.where(bit_of_tone, e_b, neg_inf), axis=-2)  # [..., S, bps]
    max_zero = jnp.max(jnp.where(~bit_of_tone, e_b, neg_inf), axis=-2)
    llrs = (max_one - max_zero).astype(jnp.float32)
    return llrs.reshape(*energies.shape[:-2], energies.shape[-2] * bps)


def estimate_snr_db(config: ModemConfig, energies: jnp.ndarray) -> jnp.ndarray:
    """Per-stream SNR estimate from the filterbank output.

    Signal power ~ winning-bin energy; noise power ~ mean of the losing
    bins (orthogonal bins see only noise at correct timing). Aggregated
    over the symbol axis. Returns dB, shape = energies.shape[:-2].
    """
    m = config.num_tones
    best = jnp.max(energies, axis=-1)
    rest = (jnp.sum(energies, axis=-1) - best) / (m - 1)
    sig = jnp.mean(best, axis=-1)
    noise = jnp.maximum(jnp.mean(rest, axis=-1), jnp.float32(1e-20))
    return 10.0 * jnp.log10(jnp.maximum(sig / noise - 1.0, jnp.float32(1e-6)))
