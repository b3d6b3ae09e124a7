"""Modulation-family dispatch: one place that knows MFSK from OFDM.

Every family-generic consumer (the streaming receiver, the BER sweep, the
CLI) resolves its transmit / aligned-demodulate / geometry functions here
instead of re-implementing isinstance checks. Dispatch happens at trace
time (configs are static), so there is no runtime cost.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def is_ofdm(config) -> bool:
    from anet.dsp.ofdm import OfdmConfig

    return isinstance(config, OfdmConfig)


def transmit_fn(config) -> Callable:
    """payloads uint8[..., N] -> frame waveforms, for either family."""
    if is_ofdm(config):
        from anet.dsp import ofdm

        return lambda p: ofdm.transmit(config, p)
    from anet.dsp.pipeline import transmit

    return lambda p: transmit(config, p)


def aligned_demod_fn(config, payload_len: int, compute_dtype=jnp.float32) -> Callable:
    """Symbol-aligned frame waveform -> FrameResult, for either family."""
    if is_ofdm(config):
        from anet.dsp import ofdm

        return lambda w: ofdm.demodulate_frame(config, w, payload_len)
    from anet.dsp.frame import demodulate_frame

    return lambda w: demodulate_frame(
        config, w, payload_len, compute_dtype=compute_dtype
    )


def aligned_demod_dynamic_fn(
    config, max_payload_len: int, compute_dtype=jnp.float32
) -> Callable:
    """Symbol-aligned max-length window -> DynamicFrameResult (payload
    length read from the frame header), for either family."""
    if is_ofdm(config):
        from anet.dsp import ofdm

        return lambda w: ofdm.demodulate_frame_dynamic(config, w, max_payload_len)
    from anet.dsp.frame import demodulate_frame_dynamic

    return lambda w: demodulate_frame_dynamic(
        config, w, max_payload_len, compute_dtype=compute_dtype
    )


def frame_samples(config, payload_len: int) -> int:
    if is_ofdm(config):
        return config.frame_num_samples(payload_len)
    from anet.dsp.frame import frame_num_samples

    return frame_num_samples(config, payload_len)


def waveform_snr_db(config, snr_db):
    """Normalize a demod SNR estimate to waveform-scale AWGN dB.

    FrameResult.snr_db means different things per family: MFSK reports
    in-bin SNR (the filterbank's 10*log10(sps/2) coherent processing gain
    is included — measured exact across 5-15 dB), while OFDM's EVM-based
    estimate is already waveform-scale (within 0.3 dB). This converts both
    to the scale of anet.channel.awgn / models.OPERATING_SNR_DB, so either
    family's estimate feeds models.suggest_model directly.
    """
    if is_ofdm(config):
        return snr_db
    import numpy as np

    return snr_db - 10.0 * np.log10(config.samples_per_symbol / 2.0)


def preamble_template(config) -> jnp.ndarray:
    if is_ofdm(config):
        from anet.dsp import ofdm

        return ofdm.preamble_waveform(config).astype(jnp.float32)
    from anet.dsp.sync import preamble_waveform

    return preamble_waveform(config).astype(jnp.float32)


def geometry(
    config, payload_len: int, compute_dtype=jnp.float32
) -> Tuple[int, jnp.ndarray, Callable]:
    """(frame_samples, preamble_template, aligned_demod_fn) in one call —
    the shape the streaming receiver consumes."""
    return (
        frame_samples(config, payload_len),
        preamble_template(config),
        aligned_demod_fn(config, payload_len, compute_dtype),
    )
