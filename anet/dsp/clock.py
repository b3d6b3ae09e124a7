"""Symbol-clock recovery: fractional-delay timing + drift tracking.

The classic hard-to-vectorize part of a demodulator (SURVEY.md §7.3):
transmitter and receiver sample clocks differ by a static sub-sample
offset plus a slow rate drift (crystal tolerance, ~±100 ppm), so symbol
windows slide out of alignment over a frame and the orthogonal filterbank
starts leaking between tones.

Formulation (per the survey's guidance): fixed-rate processing with
fractional-delay interpolation and carry-state offsets — NOT data-dependent
resampling. A `lax.scan` walks the frame symbol by symbol; the carry is the
(float) sample position of the current symbol window; each step

  1. gathers the on-time window at the fractional position (linear
     interpolation — two gathers and a lerp),
  2. computes filterbank energies for on-time, early (-delta) and late
     (+delta) windows — three [B, sps] x [sps, 2M] matmuls,
  3. decides the symbol from the on-time energies,
  4. nudges timing toward the energy peak with the bounded early/late
     error e = (E_late - E_early) / (E_late + E_early) of the winning tone
     (a decision-directed Gardner-style gate).

Sequential over symbols, parallel over streams: each scan step is a batched
matmul, so thousands of tracked streams demodulate concurrently on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from anet.dsp.bits import gray_decode
from anet.dsp.demod import demod_basis
from anet.dsp.params import ModemConfig


class TrackedDemodResult(NamedTuple):
    symbols: jnp.ndarray  # int32 [..., S] decided data symbols
    energies: jnp.ndarray  # float32 [..., S, M] on-time energies
    timing: jnp.ndarray  # float32 [..., S] sample position per symbol
    timing_error: jnp.ndarray  # float32 [..., S] early/late error signal


def _gather_window(
    samples: jnp.ndarray, t0: jnp.ndarray, sps: int
) -> jnp.ndarray:
    """Fractionally-delayed [.., sps] window starting at float position t0."""
    base = jnp.floor(t0).astype(jnp.int32)
    frac = (t0 - base)[..., None]
    offsets = jnp.arange(sps, dtype=jnp.int32)
    idx = base[..., None] + offsets
    n = samples.shape[-1]
    idx = jnp.clip(idx, 0, n - 2)
    if samples.ndim == 1:
        s0 = samples[idx]
        s1 = samples[idx + 1]
    else:
        s0 = jnp.take_along_axis(samples, idx, axis=-1)
        s1 = jnp.take_along_axis(samples, idx + 1, axis=-1)
    return s0 * (1.0 - frac) + s1 * frac


def demodulate_symbols_tracked(
    config: ModemConfig,
    samples: jnp.ndarray,
    num_symbols: int,
    start_pos: jnp.ndarray | float = 0.0,
    *,
    loop_gain: float = 0.35,
    delta: float = 2.0,
    compute_dtype=jnp.float32,
) -> TrackedDemodResult:
    """Demodulate ``num_symbols`` with decision-directed timing tracking.

    Args:
      samples: float [..., N] — must extend at least
        num_symbols * sps + delta + 2 past ``start_pos``.
      start_pos: float (batched ok) initial sample position of symbol 0
        (integer offset + sub-sample refinement from preamble sync).
      loop_gain: proportional timing correction (samples per unit error per
        symbol). The loop is second-order — a rate accumulator (gain
        loop_gain/16) absorbs constant clock drift with zero steady-state
        lag, so ±1000 ppm tracks cleanly.
      delta: early/late probe spacing in samples.
    """
    sps = config.samples_per_symbol
    m = config.num_tones
    basis = demod_basis(config, dtype=compute_dtype)  # [sps, 2M]
    batch_shape = samples.shape[:-1]
    t0 = jnp.broadcast_to(jnp.asarray(start_pos, jnp.float32), batch_shape)
    rate_gain = loop_gain / 16.0

    def energies_at(pos: jnp.ndarray) -> jnp.ndarray:
        window = _gather_window(samples, pos, sps).astype(compute_dtype)
        iq = jnp.matmul(window, basis, preferred_element_type=jnp.float32)
        i, q = iq[..., :m], iq[..., m:]
        return i * i + q * q  # [..., M]

    def step(carry, _):
        t, rate = carry
        e_on = energies_at(t)
        tone = jnp.argmax(e_on, axis=-1)
        e_early = energies_at(t - delta)
        e_late = energies_at(t + delta)
        win_early = jnp.take_along_axis(e_early, tone[..., None], axis=-1)[..., 0]
        win_late = jnp.take_along_axis(e_late, tone[..., None], axis=-1)[..., 0]
        err = (win_late - win_early) / jnp.maximum(win_late + win_early, 1e-20)
        rate_next = rate + rate_gain * err
        t_next = t + sps + rate_next + loop_gain * err
        return (t_next, rate_next), (tone.astype(jnp.int32), e_on, t, err)

    init = (t0, jnp.zeros_like(t0))
    _, (tones, energies, timing, errors) = jax.lax.scan(
        step, init, None, length=num_symbols
    )
    # scan stacks along a leading axis; move it behind the batch axes
    def tm(x):
        return jnp.moveaxis(x, 0, len(batch_shape))

    symbols = gray_decode(tm(tones), config.bits_per_symbol)
    return TrackedDemodResult(
        symbols=symbols,
        energies=tm(energies),
        timing=tm(timing),
        timing_error=tm(errors),
    )


def tracked_frame_result(
    config: ModemConfig,
    samples: jnp.ndarray,
    payload_len: int,
    start_pos,
    *,
    loop_gain: float = 0.35,
    compute_dtype=jnp.float32,
):
    """Tracked demod + frame parse in one step (shared by the one-shot
    receiver and the streaming receiver). ``samples`` must extend past
    start_pos + data samples by the tracker's probe margin (delta + 2) —
    give stretched frames (slow RX clock) extra tail room.

    Returns (FrameResult, TrackedDemodResult)."""
    from anet.dsp.frame import (
        data_symbols_for_payload,
        frame_result_from_decisions,
    )

    tracked = demodulate_symbols_tracked(
        config,
        samples,
        data_symbols_for_payload(config, payload_len),
        start_pos=start_pos,
        loop_gain=loop_gain,
        compute_dtype=compute_dtype,
    )
    frame = frame_result_from_decisions(
        config, tracked.symbols, tracked.energies, payload_len
    )
    return frame, tracked


def estimate_drift_ppm(config: ModemConfig, result: TrackedDemodResult) -> jnp.ndarray:
    """Clock drift estimate from the tracked timing trajectory.

    Least-squares slope of (timing[i] - i*sps) over the symbol index,
    converted to parts-per-million of the sample clock.
    """
    sps = config.samples_per_symbol
    s = result.timing.shape[-1]
    idx = jnp.arange(s, dtype=jnp.float32)
    residual = result.timing - result.timing[..., :1] - idx * sps
    idx_c = idx - idx.mean()
    slope = jnp.sum(residual * idx_c, axis=-1) / jnp.sum(idx_c * idx_c)
    return slope / sps * 1e6
