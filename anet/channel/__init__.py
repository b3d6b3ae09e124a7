"""Channel simulator: AWGN, multipath, dropouts, clipping, gain/offset.

This is the framework's fault-injection layer (SURVEY.md §5): where the
reference's failure story is WiFi disconnects and TCP decode errors
(network.cpp:157-199,432-434), anet injects impairments into the signal
path deterministically under `jax.random` keys, and the receiver's verdicts
(FrameResult, ReceiverError feedback) measure the damage.

All impairments are pure array ops, batched over leading axes; a composite
`apply_channel` runs the physically-ordered chain
multipath -> gain -> dropout -> AWGN -> clip.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "ChannelConfig",
    "awgn",
    "apply_channel",
    "clip",
    "dropout",
    "multipath",
    "sample_rate_drift",
    "snr_scale",
]


def snr_scale(signal_power: jnp.ndarray, snr_db: jnp.ndarray) -> jnp.ndarray:
    """Noise standard deviation achieving ``snr_db`` against ``signal_power``."""
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    return jnp.sqrt(noise_power)


def awgn(
    key: jax.Array, samples: jnp.ndarray, snr_db: jnp.ndarray | float
) -> jnp.ndarray:
    """Additive white Gaussian noise at a target SNR.

    SNR is measured against the *actual* mean power of ``samples`` along the
    last axis, so the same snr_db means the same operating point regardless
    of amplitude/multipath scaling. ``snr_db`` may be batched (one value per
    leading-axis stream) — that is how BER sweeps shard an SNR grid.
    """
    power = jnp.mean(samples * samples, axis=-1, keepdims=True)
    sigma = snr_scale(power, jnp.asarray(snr_db, samples.dtype)[..., None])
    noise = jax.random.normal(key, samples.shape, dtype=samples.dtype)
    return samples + sigma * noise


def multipath(samples: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Convolve with an echo impulse response (causal FIR, same length out).

    ``taps`` is a short 1-D impulse response, tap 0 = direct path (e.g.
    [1.0, 0, 0, 0.5] = one echo at 3 samples, half amplitude).
    """
    k = taps.shape[-1]
    padded = jnp.concatenate(
        [jnp.zeros(samples.shape[:-1] + (k - 1,), samples.dtype), samples], axis=-1
    )
    # y[t] = sum_j taps[j] * x[t - j]: gather shifted views and contract —
    # k is small (a handful of echoes), so this stays cheap and fusible.
    n = samples.shape[-1]
    shifted = jnp.stack(
        [padded[..., k - 1 - j : k - 1 - j + n] for j in range(k)], axis=-1
    )
    return jnp.einsum("...tk,k->...t", shifted, taps.astype(samples.dtype))


def dropout(
    key: jax.Array,
    samples: jnp.ndarray,
    drop_rate: float,
    burst_samples: int,
) -> jnp.ndarray:
    """Zero out bursts of samples (the packet-loss / underflow analog).

    Each non-overlapping ``burst_samples`` block is dropped i.i.d. with
    probability ``drop_rate``.
    """
    n = samples.shape[-1]
    n_blocks = -(-n // burst_samples)
    keep = (
        jax.random.uniform(key, samples.shape[:-1] + (n_blocks,)) >= drop_rate
    ).astype(samples.dtype)
    mask = jnp.repeat(keep, burst_samples, axis=-1)[..., :n]
    return samples * mask


def clip(samples: jnp.ndarray, level: float) -> jnp.ndarray:
    """Hard-limit the waveform (speaker/ADC saturation)."""
    return jnp.clip(samples, -level, level)


def sample_rate_drift(samples: jnp.ndarray, ppm: float) -> jnp.ndarray:
    """Resample by a tiny rate offset (RX clock running ``ppm`` fast).

    Models the TX/RX crystal mismatch every real modem faces (~±100 ppm):
    the receiver effectively samples at positions i*(1+ppm*1e-6). Linear
    interpolation; same output length (tail clamps to the last sample).
    Recovered by the timing tracker in anet.dsp.clock.
    """
    n = samples.shape[-1]
    pos = jnp.arange(n, dtype=jnp.float32) * (1.0 + ppm * 1e-6)
    base = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    frac = pos - base
    s0 = samples[..., base]
    s1 = samples[..., base + 1]
    return s0 * (1.0 - frac) + s1 * frac


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    """Composite channel; JSON round-trip like all anet configs.

    snr_db=None disables noise; multipath_taps=None disables echoes;
    drop_rate=0 disables dropouts; clip_level=None disables clipping.
    """

    snr_db: Optional[float] = 10.0
    multipath_taps: Optional[Tuple[float, ...]] = None
    gain: float = 1.0
    drop_rate: float = 0.0
    drop_burst_samples: int = 256
    clip_level: Optional[float] = None
    drift_ppm: float = 0.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "ChannelConfig":
        raw = json.loads(text)
        if raw.get("multipath_taps") is not None:
            raw["multipath_taps"] = tuple(raw["multipath_taps"])
        return cls(**raw)


def apply_channel(
    key: jax.Array,
    samples: jnp.ndarray,
    config: ChannelConfig,
    snr_db: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    """Run the full impairment chain. ``snr_db`` overrides config.snr_db
    (possibly batched, for sweeps)."""
    out = samples
    if config.drift_ppm:
        out = sample_rate_drift(out, config.drift_ppm)
    if config.multipath_taps is not None:
        out = multipath(out, jnp.asarray(config.multipath_taps))
    if config.gain != 1.0:
        out = out * config.gain
    key_drop, key_noise = jax.random.split(key)
    if config.drop_rate > 0.0:
        out = dropout(key_drop, out, config.drop_rate, config.drop_burst_samples)
    effective_snr = config.snr_db if snr_db is None else snr_db
    if effective_snr is not None:
        out = awgn(key_noise, out, effective_snr)
    if config.clip_level is not None:
        out = clip(out, config.clip_level)
    return out
