"""Modem model families: named, tuned presets of the signal chain.

The registry maps a model name to a (ModemConfig, notes) pair. Families:

- ``fsk2-robust``   — binary FSK, low rate, maximum noise margin; the
                      acoustic-coupler regime.
- ``mfsk4-voice``   — 4-FSK in the voice band (300-3400 Hz), telephone-
                      channel compatible.
- ``mfsk8-audible`` — 8-FSK mid-band, balanced rate/robustness.
- ``mfsk16-fast``   — the flagship: 16-FSK, 3 kbps, full audio band
                      (default everywhere; bench.py measures this one).
- ``mfsk16-ultra``  — 16-FSK at 1500 baud (6 kbps), clean-channel links.
- ``mfsk32-dense``  — 32-FSK wideband, highest rate, needs high SNR.
- ``ofdm-fast``     — 96-carrier QPSK OFDM, 28.8 kbps, one-tap multipath
                      equalization; the wideband family.
- ``ofdm-coded``    — OFDM with rate-1/2 soft-Viterbi coding + interleaver,
                      14.4 kbps net; the reverberant-room workhorse.
- ``ofdm-turbo``    — coded 16-QAM OFDM, 57.6 kbps air / 28.8 kbps net.
- ``ofdm-max``      — coded 64-QAM OFDM, 86.4 kbps air / 43.2 kbps net;
                      the highest-rate preset.

MFSK presets keep the orthogonal tone plan (spacing = symbol rate), so
the demod filterbank stays exactly orthogonal (anet.dsp.params).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

from anet.dsp.ofdm import OfdmConfig
from anet.dsp.params import ModemConfig


class ModemModel(NamedTuple):
    name: str
    config: object  # ModemConfig (MFSK) or OfdmConfig
    description: str


_REGISTRY: Dict[str, ModemModel] = {}


def register(model: ModemModel) -> ModemModel:
    if model.name in _REGISTRY:
        raise ValueError(f"model '{model.name}' already registered")
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> ModemModel:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown modem model '{name}'; available: {sorted(_REGISTRY)}"
        ) from None


def list_models() -> List[ModemModel]:
    return [_REGISTRY[k] for k in sorted(_REGISTRY)]


# Measured operating thresholds: the lowest waveform SNR (dB, AWGN) at
# which each preset's frame error rate is ~0 (docs/BER.md sweeps). The
# link-adaptation rule picks the fastest preset whose threshold fits.
OPERATING_SNR_DB = {
    "fsk2-robust": -6.0,
    "mfsk4-voice": 2.0,
    "mfsk4-coded": -4.0,
    # same code/geometry as mfsk4-coded minus the interleaver: identical
    # AWGN threshold (the interleaver only helps bursts)
    "mfsk4-coded-stream": -4.0,
    "mfsk8-audible": 1.0,
    "mfsk16-fast": 0.0,
    "mfsk16-ultra": 6.0,
    "mfsk32-dense": 0.0,
    "ofdm-fast": 14.0,
    "ofdm-coded": 4.0,
    "ofdm-turbo": 10.0,
    "ofdm-max": 18.0,
}


def net_bit_rate_bps(model: ModemModel) -> float:
    """Payload bit rate after FEC overhead."""
    rate = model.config.bit_rate_bps
    if getattr(model.config, "fec", "none") == "conv":
        rate /= 2.0
    return rate


def suggest_model(snr_db: float, margin_db: float = 2.0) -> ModemModel:
    """Link adaptation: the fastest preset whose measured operating
    threshold fits the reported SNR minus a safety margin.

    Feed it a waveform-scale SNR: pass any FrameResult.snr_db through
    anet.dsp.family.waveform_snr_db(config, snr_db) first (it normalizes
    the MFSK filterbank's processing gain; OFDM estimates pass through).
    Falls back to the most robust preset when nothing fits.
    """
    usable = [
        m for m in list_models()
        if OPERATING_SNR_DB.get(m.name, float("inf")) <= snr_db - margin_db
    ]
    if not usable:
        return min(list_models(), key=lambda m: OPERATING_SNR_DB.get(m.name, 1e9))
    return max(usable, key=net_bit_rate_bps)


register(
    ModemModel(
        "fsk2-robust",
        ModemConfig(
            sample_rate_hz=48_000,
            symbol_rate_hz=375,
            num_tones=2,
            base_freq_hz=1_500.0,
            tone_spacing_multiple=2,
            preamble_symbols=48,
        ),
        "Binary FSK, 375 bps, wide tone spacing and long preamble for "
        "maximum noise/multipath margin.",
    )
)

register(
    ModemModel(
        "mfsk4-voice",
        ModemConfig(
            sample_rate_hz=8_000,
            symbol_rate_hz=250,
            num_tones=4,
            base_freq_hz=800.0,
            preamble_symbols=32,
        ),
        "4-FSK inside the 300-3400 Hz voice band at 8 kHz sampling; "
        "survives telephone-grade channels at 500 bps.",
    )
)

register(
    ModemModel(
        "mfsk8-audible",
        ModemConfig(
            sample_rate_hz=24_000,
            symbol_rate_hz=500,
            num_tones=8,
            base_freq_hz=2_000.0,
            preamble_symbols=32,
        ),
        "8-FSK mid-band at 24 kHz sampling, 1.5 kbps; the balanced default "
        "for loudspeaker-to-microphone links.",
    )
)

register(
    ModemModel(
        "mfsk16-fast",
        ModemConfig(),  # the framework default: 16-FSK @ 750 baud, 3 kbps
        "Flagship 16-FSK at 48 kHz, 3 kbps, tones 3.0-14.25 kHz; the "
        "benchmark configuration.",
    )
)

register(
    ModemModel(
        "mfsk16-ultra",
        ModemConfig(
            symbol_rate_hz=1_500,
            num_tones=16,
            base_freq_hz=1_200.0,
            preamble_symbols=24,
        ),
        "16-FSK at 1500 baud (6 kbps); for clean, wideband channels.",
    )
)

register(
    ModemModel(
        "mfsk4-coded",
        ModemConfig(
            sample_rate_hz=48_000,
            symbol_rate_hz=1_500,
            num_tones=4,
            base_freq_hz=3_000.0,
            preamble_symbols=32,
            fec="conv",
            fec_interleave=24,
        ),
        "4-FSK with rate-1/2 K=7 convolutional coding (soft Viterbi) and a "
        "depth-24 block interleaver; 1.5 kbps net, ~4 dB coding gain at the "
        "frame-error cliff plus burst-error immunity.",
    )
)

register(
    ModemModel(
        "mfsk4-coded-stream",
        ModemConfig(
            sample_rate_hz=48_000,
            symbol_rate_hz=1_500,
            num_tones=4,
            base_freq_hz=3_000.0,
            preamble_symbols=32,
            fec="conv",
            fec_interleave=1,
        ),
        "mfsk4-coded without the block interleaver: the robust rung for "
        "VARIABLE-LENGTH streaming — a depth-d interleaver's geometry "
        "depends on the section length the header declares, so dynamic "
        "coded frames (stream.receive_stream_dynamic, fec='conv') need "
        "interleave-free framing; same AWGN coding gain, no burst "
        "dispersion.",
    )
)

register(
    ModemModel(
        "mfsk32-dense",
        ModemConfig(
            symbol_rate_hz=600,
            num_tones=32,
            base_freq_hz=2_400.0,
            preamble_symbols=24,
        ),
        "32-FSK, 3 kbps in 600 baud; dense tone packing trades SNR margin "
        "for spectral efficiency.",
    )
)


register(
    ModemModel(
        "ofdm-fast",
        OfdmConfig(),
        "96-carrier QPSK OFDM at 48 kHz: 28.8 kbps in 3.0-20.8 kHz with a "
        "1.3 ms cyclic prefix; per-carrier equalization absorbs room echo.",
    )
)

register(
    ModemModel(
        "ofdm-coded",
        OfdmConfig(fec="conv", fec_interleave=32),
        "Coded OFDM (rate-1/2 K=7 soft Viterbi + depth-32 interleaver): "
        "14.4 kbps net, rides out deep carrier fades and bursts.",
    )
)


register(
    ModemModel(
        "ofdm-max",
        OfdmConfig(bits_per_carrier=6, fec="conv", fec_interleave=32),
        "64-QAM coded OFDM: 86.4 kbps on the air, 43.2 kbps net with soft "
        "Viterbi + interleaving; the highest-rate preset (~18 dB), headroom "
        "for two simultaneous high-quality Opus streams.",
    )
)


register(
    ModemModel(
        "ofdm-turbo",
        OfdmConfig(bits_per_carrier=4, fec="conv", fec_interleave=32),
        "16-QAM coded OFDM: 57.6 kbps on the air, 28.8 kbps net with soft "
        "Viterbi + interleaving (~10 dB); enough for a real-time 24 kbps "
        "Opus stream over sound.",
    )
)


class Classification(NamedTuple):
    """One candidate's score from classify_capture."""

    name: str
    quality: float  # normalized preamble-match quality in [0, 1]
    offset: int  # sample index of the best preamble match
    header_ok: bool | None  # tie-break verdict; None = not attempted


def classify_capture(samples, candidates=None, payload_len=None):
    """Identify which modem preset a capture carries.

    The blind-receiver analog of the reference's magic-word filtering
    (discovery.kt:87-89): every preset transmits a preset-specific known
    preamble, so classification is one matched-filter pass per candidate,
    ranked by Cauchy-Schwarz-normalized correlation quality.

    MFSK presets all have distinct preamble waveforms (the PN tone
    pattern depends on the tone count, and the synthesis on rate/band).
    The OFDM presets intentionally SHARE one preamble (FEC and QAM order
    do not change it), so near-ties are disambiguated by demodulating
    the frame at the detected offset and checking the header gate
    (magic word + header CRC, 48 bits): with ``payload_len`` given every
    candidate can be validated; without it only uncoded candidates can
    (their payload length is read from the header).

    Args:
      samples: float [N] capture (one stream).
      candidates: model names to consider (default: every registered
        preset whose preamble fits in the capture).
      payload_len: expected payload bytes, if known — enables header
        validation of coded candidates.
    Returns:
      List[Classification], best first. Validation verdicts are filled
      for the tied leaders only (quality within 0.05 of the best).
    """
    import jax.numpy as jnp
    import numpy as np

    from anet.dsp import family

    from anet.dsp.sync import (
        correlate_template,
        normalized_match_quality,
        sliding_window_energy,
    )

    x = jnp.asarray(np.asarray(samples, np.float32))
    names = candidates or [m.name for m in list_models()]
    scored = []
    for name in names:
        cfg = get_model(name).config
        tmpl = family.preamble_template(cfg)
        k = int(tmpl.shape[-1])
        if x.shape[-1] <= k:
            continue
        corr = correlate_template(x, tmpl, method="auto")
        q = normalized_match_quality(
            corr, sliding_window_energy(x, k), jnp.sum(tmpl * tmpl)
        )
        off = int(jnp.argmax(q))
        scored.append((name, float(q[off]), off))
    scored.sort(key=lambda t: -t[1])
    if not scored:
        return []

    best_q = scored[0][1]
    out = []
    leaders = [t for t in scored if best_q - t[1] <= 0.05]
    verdicts = {}
    for name, q, off in leaders:
        verdicts[name] = _validate_header(name, x, off, payload_len)
    # Among the tied leaders, a verified header outranks raw quality.
    leaders.sort(key=lambda t: (verdicts[t[0]] is not True, -t[1]))
    rest = [t for t in scored if best_q - t[1] > 0.05]
    for name, q, off in leaders + rest:
        out.append(Classification(name, q, off, verdicts.get(name)))
    return out


def _validate_header(name, x, offset, payload_len):
    """True/False if a demod at ``offset`` could check the header gate,
    None if this candidate cannot be validated without a payload length."""
    import jax

    from anet.dsp import family

    cfg = get_model(name).config
    n = int(x.shape[-1])
    try:
        if payload_len is not None:
            t = family.frame_samples(cfg, payload_len)
            if offset + t > n:
                return None
            frame = family.aligned_demod_fn(cfg, payload_len)(
                jax.lax.dynamic_slice_in_dim(x, offset, t)
            )
        else:
            if getattr(cfg, "fec", "none") != "none":
                return None  # coded headers need the payload length
            max_len = 64
            t = family.frame_samples(cfg, max_len)
            if offset + t > n:
                return None
            frame = family.aligned_demod_dynamic_fn(cfg, max_len)(
                jax.lax.dynamic_slice_in_dim(x, offset, t)
            )
        return bool(frame.magic_ok) and bool(frame.header_crc_ok)
    except Exception:  # noqa: BLE001 — a candidate that cannot demod is just unverified
        return None

