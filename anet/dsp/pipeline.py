"""End-to-end single-frame modem pipeline: the minimum end-to-end slice
(SURVEY.md §7.2 step 2 / BASELINE config 1).

transmit(): payload bytes -> frame waveform.
receive_frame(): unaligned capture -> preamble sync -> aligned demod ->
payload + verdicts + sync metrics.

Pure functions; wrap in jax.jit with config/payload_len static. Batched via
leading axes (the reference's 1-to-N receiver fan-out becomes a batch axis,
SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from anet.dsp.frame import (
    FrameResult,
    demodulate_frame,
    frame_num_samples,
    modulate_frame,
)
from anet.dsp.params import ModemConfig
from anet.dsp.sync import SyncResult, aligned_gather, locate_preamble


def transmit(config: ModemConfig, payload: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """payload uint8[..., N] -> waveform float[..., frame_num_samples]."""
    return modulate_frame(config, payload, dtype=dtype)


class ReceiveResult(NamedTuple):
    frame: FrameResult
    sync: SyncResult


def receive_frame(
    config: ModemConfig,
    capture: jnp.ndarray,
    payload_len: int,
    *,
    sync_method: str = "auto",
    compute_dtype=jnp.float32,
) -> ReceiveResult:
    """Locate and demodulate one frame inside a longer capture.

    Args:
      capture: float [..., N] with N >= frame_num_samples(config, payload_len).
    The preamble may start anywhere such that the whole frame fits; timing is
    recovered by matched-filter correlation (anet.dsp.sync).
    """
    t = frame_num_samples(config, payload_len)
    n = capture.shape[-1]
    if n < t:
        raise ValueError(f"capture of {n} samples cannot hold a {t}-sample frame")
    sync = locate_preamble(config, capture, method=sync_method)
    # Clamp so the gathered window stays in bounds even on a bogus lock.
    start = jnp.clip(sync.offset, 0, n - t)
    aligned = aligned_gather(capture, start, t)
    frame = demodulate_frame(
        config, aligned, payload_len, compute_dtype=compute_dtype
    )
    return ReceiveResult(frame=frame, sync=sync)


class TrackedReceiveResult(NamedTuple):
    frame: FrameResult
    sync: SyncResult
    drift_ppm: jnp.ndarray  # estimated RX clock drift
    timing_error_rms: jnp.ndarray  # residual tracker error


def receive_frame_tracked(
    config: ModemConfig,
    capture: jnp.ndarray,
    payload_len: int,
    *,
    sync_method: str = "auto",
    loop_gain: float = 0.35,
    compute_dtype=jnp.float32,
) -> TrackedReceiveResult:
    """receive_frame with symbol-clock recovery (anet.dsp.clock).

    Locates the preamble (integer + sub-sample), then demodulates the data
    section with the decision-directed timing tracker, so frames survive
    TX/RX sample-clock drift that breaks the block demodulator. Also
    returns the estimated drift in ppm — a quality metric the receiver can
    report upstream.
    """
    from anet.dsp.clock import estimate_drift_ppm, tracked_frame_result

    t = frame_num_samples(config, payload_len)
    n = capture.shape[-1]
    if n < t:
        raise ValueError(f"capture of {n} samples cannot hold a {t}-sample frame")
    sync = locate_preamble(config, capture, method=sync_method)
    start = (
        jnp.clip(sync.offset, 0, n - t).astype(jnp.float32)
        + sync.frac
        + config.preamble_samples
    )
    frame, tracked = tracked_frame_result(
        config,
        capture,
        payload_len,
        start,
        loop_gain=loop_gain,
        compute_dtype=compute_dtype,
    )
    return TrackedReceiveResult(
        frame=frame,
        sync=sync,
        drift_ppm=estimate_drift_ppm(config, tracked),
        timing_error_rms=jnp.sqrt(jnp.mean(tracked.timing_error**2, axis=-1)),
    )


class DynamicReceiveResult(NamedTuple):
    frame: "jnp.ndarray"  # DynamicFrameResult (family-shared)
    offset: jnp.ndarray  # int32[...] located frame start
    quality: jnp.ndarray  # float32[...] sync match quality


def receive_frame_dynamic(
    config,
    capture: jnp.ndarray,
    max_payload_len: int,
    *,
    compute_dtype=jnp.float32,
) -> DynamicReceiveResult:
    """Locate and demodulate one variable-length frame (either family).

    The payload length is read from the frame header (demodulate a
    max-length window, masked CRC over the declared length) — the caller
    only bounds it. ``capture`` must be at least
    frame_samples(config, max_payload_len) long; pad short captures with
    zeros. Coded configs (fec='conv', fec_interleave <= 1) decode through
    the header probe + masked-trellis Viterbi
    (frame.frame_result_from_llrs_dynamic); a depth-d block interleaver is
    the one exclusion (length-dependent geometry).
    """
    from anet.dsp.family import (
        aligned_demod_dynamic_fn,
        frame_samples,
        preamble_template,
    )
    from anet.dsp.sync import (
        correlate_template,
        normalized_match_quality,
        sliding_window_energy,
    )

    t = frame_samples(config, max_payload_len)
    n = capture.shape[-1]
    if n < t:
        raise ValueError(
            f"capture of {n} samples cannot hold a {t}-sample max-length frame"
        )
    template = preamble_template(config)
    corr = correlate_template(capture, template, method="auto")
    energy = sliding_window_energy(capture, template.shape[-1])
    quality = normalized_match_quality(corr, energy, jnp.sum(template * template))
    offset = jnp.argmax(quality, axis=-1).astype(jnp.int32)
    best_q = jnp.take_along_axis(quality, offset[..., None], axis=-1)[..., 0]
    start = jnp.clip(offset, 0, n - t)
    aligned = aligned_gather(capture, start, t)
    frame = aligned_demod_dynamic_fn(config, max_payload_len, compute_dtype)(aligned)
    return DynamicReceiveResult(frame=frame, offset=offset, quality=best_q)


def loopback(
    config: ModemConfig, payload: jnp.ndarray, pad_before: int = 0, pad_after: int = 0
) -> ReceiveResult:
    """transmit -> (optional silence padding) -> receive. Debug/test helper."""
    wave = transmit(config, payload)
    if pad_before or pad_after:
        shape = wave.shape[:-1]
        wave = jnp.concatenate(
            [
                jnp.zeros(shape + (pad_before,), wave.dtype),
                wave,
                jnp.zeros(shape + (pad_after,), wave.dtype),
            ],
            axis=-1,
        )
    return receive_frame(config, wave, payload.shape[-1])
