"""MFSK modulator: symbols -> waveform (vectorized XLA ops).

Capability parity: this is the transmit-side codec stage of the reference
(OpusEncoder.kt:156-170 encodes PCM frames; here the "encoding" is tone
synthesis carrying the framed bytes). Fully batched: leading axes vmap/shard
cleanly, per the rebuild's fan-out-as-batch-axis design (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax.numpy as jnp

from anet.dsp.params import ModemConfig


def _tone_freqs(config: ModemConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(config.tone_freqs_hz, dtype=dtype)


def synthesize_tones(
    config: ModemConfig, tone_indices: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Synthesize the waveform for a sequence of tone indices.

    Args:
      tone_indices: int array [..., S] of tone numbers in [0, num_tones).
    Returns:
      float array [..., S * samples_per_symbol].

    Two synthesis modes (config.phase_continuous):
      - block-phase: every symbol starts at phase 0. With orthogonal tone
        spacing each tone completes an integer number of cycles per symbol,
        so the waveform is still continuous at boundaries (sin ends at 0);
        the demod basis matches it exactly.
      - continuous-phase (CPFSK): the instantaneous phase is the cumulative
        sum of per-sample frequency increments — one `cumsum`, which XLA
        lowers to a parallel prefix scan, not a serial loop.
    """
    sps = config.samples_per_symbol
    # Phases ALWAYS in float32; only the final waveform is rounded to
    # ``dtype``. Phase values reach ~1e2 radians, so low-precision phase
    # arithmetic corrupts the sinusoids outright — the bf16 failure mode
    # demod_basis documents (measured: 88% of bf16 table entries wrong).
    freqs = _tone_freqs(config, jnp.float32)[tone_indices]  # [..., S]
    t = jnp.arange(sps, dtype=jnp.float32) / config.sample_rate_hz  # [sps]
    if config.phase_continuous:
        # Per-sample frequency, then phase = cumsum(2*pi*f/fs) along time.
        f_per_sample = jnp.repeat(freqs, sps, axis=-1)  # [..., S*sps]
        dphi = 2.0 * jnp.pi * f_per_sample / config.sample_rate_hz
        phase = jnp.cumsum(dphi, axis=-1) - dphi  # phase at sample start
        wave = jnp.sin(phase)
    else:
        phase = 2.0 * jnp.pi * freqs[..., :, None] * t  # [..., S, sps]
        wave = jnp.sin(phase).reshape(*freqs.shape[:-1], freqs.shape[-1] * sps)
    return (config.amplitude * wave).astype(dtype)


def modulate_symbols(
    config: ModemConfig, symbols: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Gray-map data symbols onto tones and synthesize.

    ``symbols`` are data values in [0, num_tones); Gray coding places
    adjacent tone errors one bit apart.
    """
    from anet.dsp.bits import gray_encode

    return synthesize_tones(config, gray_encode(symbols), dtype=dtype)
