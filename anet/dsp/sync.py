"""Preamble synchronization: detection + timing estimation.

The PHY-layer analog of the reference's magic-word filtering on discovery
datagrams (discovery.kt:87-89, network.cpp:474-484): a receiver locks onto
a frame only after the known preamble correlates above threshold.

The preamble is an alternating lowest/highest-tone pattern — maximally
distinctive against both noise and the data section. Correlation runs in
the frequency domain (rfft multiply irfft), O(N log N) and batched; the
time-domain matched filter is also provided for short captures and as the
golden model for the Pallas kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from anet.dsp.mod import synthesize_tones
from anet.dsp.params import ModemConfig


def preamble_tone_indices(config: ModemConfig) -> jnp.ndarray:
    """Fixed pseudo-noise tone pattern for the preamble.

    A periodic pattern (e.g. alternating low/high tones) has autocorrelation
    sidelobes at every pattern-period shift, which cause false locks when a
    frame is partially inside a correlation window. A fixed PN sequence over
    the full tone alphabet keeps sidelobes at ~1/sqrt(preamble_samples), so
    the normalized sync quality is sharply peaked at the true offset. The
    seed is a protocol constant (derived from the wire magic word) — both
    ends must generate the identical pattern.
    """
    import numpy as np

    rng = np.random.default_rng(0x2C5DA044)
    pattern = rng.integers(0, config.num_tones, config.preamble_symbols)
    return jnp.asarray(pattern, dtype=jnp.int32)


def preamble_waveform(config: ModemConfig, dtype=jnp.float32) -> jnp.ndarray:
    """The known preamble template, [preamble_samples]."""
    return synthesize_tones(config, preamble_tone_indices(config), dtype=dtype)


class SyncResult(NamedTuple):
    """Timing estimate for one stream (all fields batched alike)."""

    offset: jnp.ndarray  # int32 — sample index where the preamble starts
    frac: jnp.ndarray  # float32 — sub-sample refinement in (-0.5, 0.5)
    quality: jnp.ndarray  # float32 — normalized correlation in [0, 1]


def correlate_template(
    samples: jnp.ndarray,
    template: jnp.ndarray,
    method: str = "fft",
    fft_len: int | None = None,
) -> jnp.ndarray:
    """Cross-correlate [..., N] samples with a [K] template.

    Returns [..., N - K + 1] valid-mode correlation. The default FFT size
    next_pow2(N + K - 1) avoids all circular wraparound; callers that only
    consume the valid lags [0, N - K] may pass fft_len = next_pow2(N) —
    the aliased contributions land outside that range (the streaming
    receiver's per-chunk hot loop uses this to halve the FFT).
    """
    n = samples.shape[-1]
    k = template.shape[-1]
    if k > n:
        raise ValueError(f"template ({k}) longer than capture ({n})")
    if method == "direct":
        windows = _sliding_windows(samples, k)  # [..., N-K+1, K]
        return jnp.einsum("...nk,k->...n", windows, template)
    # FFT path: correlation = irfft(rfft(x) * conj(rfft(template)))
    if fft_len is None:
        fft_len = _next_pow2(n + k - 1)
    elif fft_len < n:
        raise ValueError(f"fft_len {fft_len} shorter than the capture ({n})")
    spec_x = jnp.fft.rfft(samples, n=fft_len, axis=-1)
    spec_t = jnp.fft.rfft(template, n=fft_len)
    corr = jnp.fft.irfft(spec_x * jnp.conj(spec_t), n=fft_len, axis=-1)
    return corr[..., : n - k + 1]


def _sliding_windows(samples: jnp.ndarray, k: int) -> jnp.ndarray:
    n = samples.shape[-1]
    starts = jnp.arange(n - k + 1)
    offsets = jnp.arange(k)
    idx = starts[:, None] + offsets[None, :]
    return samples[..., idx]


def sliding_window_energy(samples: jnp.ndarray, k: int) -> jnp.ndarray:
    """Energy of every k-sample window: [..., N] -> [..., N - k + 1]."""
    sq = samples * samples
    csum = jnp.cumsum(sq, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    return csum[..., k:] - csum[..., : csum.shape[-1] - k]


def normalized_match_quality(
    corr: jnp.ndarray, window_energy: jnp.ndarray, template_energy: jnp.ndarray
) -> jnp.ndarray:
    """Cauchy-Schwarz-normalized correlation quality in [0, 1].

    The window energy is floored at -40 dB of the template energy so
    near-silent windows cannot divide FFT roundoff by ~zero and report
    spurious quality; a real preamble at any receivable level clears the
    floor. Shared by the one-shot locator and the streaming receiver.
    """
    floored = jnp.maximum(window_energy, 1e-4 * template_energy)
    return jnp.abs(corr) / jnp.sqrt(template_energy * floored)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def locate_preamble(
    config: ModemConfig, samples: jnp.ndarray, method: str = "fft"
) -> SyncResult:
    """Find the preamble start in a capture.

    Args:
      samples: float [..., N] raw capture (N >= preamble_samples).
    Returns:
      SyncResult with integer offset, parabolic sub-sample refinement, and a
      normalized quality metric (1.0 = perfect match; threshold ~0.5 for
      detection under moderate noise).
    """
    template = preamble_waveform(config)
    corr = correlate_template(samples, template, method=method)
    abs_corr = jnp.abs(corr)
    offset = jnp.argmax(abs_corr, axis=-1).astype(jnp.int32)

    # Parabolic interpolation around the peak for sub-sample timing.
    n_corr = abs_corr.shape[-1]
    center = jnp.take_along_axis(abs_corr, offset[..., None], axis=-1)[..., 0]
    left_i = jnp.clip(offset - 1, 0, n_corr - 1)
    right_i = jnp.clip(offset + 1, 0, n_corr - 1)
    left = jnp.take_along_axis(abs_corr, left_i[..., None], axis=-1)[..., 0]
    right = jnp.take_along_axis(abs_corr, right_i[..., None], axis=-1)[..., 0]
    denom = left - 2.0 * center + right
    frac = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0
    ).astype(jnp.float32)
    frac = jnp.clip(frac, -0.5, 0.5)

    t_energy = jnp.sum(template * template)
    windows_energy = _local_energy(samples, template.shape[-1], offset)
    quality = normalized_match_quality(center, windows_energy, t_energy)
    return SyncResult(offset=offset, frac=frac, quality=quality)


def _local_energy(samples: jnp.ndarray, k: int, offset: jnp.ndarray) -> jnp.ndarray:
    """Energy of the k-sample window at ``offset`` (batched gather)."""
    csum = jnp.cumsum(samples * samples, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    end = jnp.take_along_axis(csum, (offset + k)[..., None], axis=-1)[..., 0]
    start = jnp.take_along_axis(csum, offset[..., None], axis=-1)[..., 0]
    return end - start
