"""OFDM modem family: QPSK subcarriers over a real (audio) channel.

A second modulation family alongside MFSK, sharing the whole frame stack
(header/CRC/FEC via anet.dsp.frame.frame_result_from_bits) and the sync
machinery (matched-filter correlation against a known preamble waveform).
Where MFSK trades rate for robustness, OFDM packs ~10x the bit rate into
the same band and equalizes multipath with one complex tap per carrier —
the acoustic channel's frequency selectivity becomes a per-carrier gain
instead of inter-symbol interference.

Signal construction (all real-valued, audio-band):
- N-point real IFFT (Hermitian spectrum), QPSK on carriers
  [first_carrier, first_carrier + n_carriers), cyclic prefix per symbol;
- frame = preamble (two identical known OFDM symbols — a distinctive
  matched-filter template) + one pilot symbol (known QPSK pattern, gives
  the per-carrier channel estimate) + data symbols;
- receive: locate by matched filter, strip CP, sparse-carrier DFT (a
  matmul — see _analysis_basis), equalize by the
  pilot-derived channel, Gray-QPSK decisions with per-bit LLRs
  (Re/Im of the matched-equalized symbol), then the shared frame parser.
"""

from __future__ import annotations

import dataclasses
import json
from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anet.dsp.frame import (
    DynamicFrameResult,
    FrameResult,
    data_section_air_bits_array,
    data_section_coded_bits,
    frame_result_from_bits,
    frame_result_from_bits_dynamic,
)
from anet.dsp.sync import normalized_match_quality, correlate_template, sliding_window_energy


@dataclasses.dataclass(frozen=True)
class OfdmConfig:
    """Static OFDM parameters (hashable -> jit-static).

    Defaults: 48 kHz audio, 256-point FFT (187.5 Hz carrier spacing), 96
    QPSK carriers spanning 3.0-20.8 kHz, 64-sample cyclic prefix (1.3 ms of
    echo tolerance) -> 192 bits per 6.67 ms symbol = 28.8 kbps channel rate.
    """

    sample_rate_hz: int = 48_000
    n_fft: int = 256
    cp_len: int = 64
    first_carrier: int = 16
    n_carriers: int = 96
    # Bits per carrier: 2 = QPSK (default), 4 = 16-QAM (double rate,
    # ~7 dB more SNR required), 6 = 64-QAM (triple rate, ~13 dB more).
    bits_per_carrier: int = 2
    preamble_repeats: int = 2  # identical symbols in the preamble
    amplitude: float = 0.5
    # 3-tap smoothing of the pilot channel estimate across carriers:
    # acoustic channels vary slowly in frequency relative to the carrier
    # spacing, so averaging neighbors halves the estimate's noise variance.
    pilot_smoothing: bool = True
    # Sample-clock drift compensation (speaker DAC vs mic ADC crystals,
    # ~±100 ppm): a timing slip of tau samples rotates carrier m by
    # 2*pi*m*tau/N, and tau grows linearly over the frame, so by a dozen
    # symbols the top carriers rotate past the QPSK decision boundary even
    # though the slip is still inside the CP. Tracking seeds a slope
    # estimate from the repeated preamble symbols (Schmidl-Cox style,
    # decision-free) and refines it per data symbol with a second-order
    # decision-directed loop — the OFDM analog of anet.dsp.clock.
    clock_tracking: bool = True
    # FEC surface shared with ModemConfig (see frame_result_from_bits)
    fec: str = "none"
    fec_interleave: int = 0

    def __post_init__(self) -> None:
        if self.fec not in ("none", "conv"):
            raise ValueError(f"fec must be 'none' or 'conv', got {self.fec!r}")
        if self.fec_interleave < 0:
            raise ValueError("fec_interleave must be >= 0")
        if self.n_fft & (self.n_fft - 1):
            raise ValueError("n_fft must be a power of two")
        if not 0 < self.cp_len < self.n_fft:
            raise ValueError("cp_len must be in (0, n_fft)")
        if self.first_carrier < 1:
            raise ValueError("first_carrier must be >= 1 (DC is unusable)")
        if self.first_carrier + self.n_carriers > self.n_fft // 2:
            raise ValueError("carriers exceed the real-signal Nyquist bin")
        if self.bits_per_carrier not in (2, 4, 6):
            raise ValueError(
                "bits_per_carrier must be 2 (QPSK), 4 (16-QAM), or 6 (64-QAM)"
            )

    # --- geometry ------------------------------------------------------------

    @property
    def symbol_samples(self) -> int:
        return self.n_fft + self.cp_len

    @property
    def bits_per_symbol(self) -> int:
        return self.bits_per_carrier * self.n_carriers

    @property
    def bit_rate_bps(self) -> float:
        return self.bits_per_symbol * self.sample_rate_hz / self.symbol_samples

    @property
    def carrier_freqs_hz(self) -> Tuple[float, ...]:
        df = self.sample_rate_hz / self.n_fft
        return tuple(
            (self.first_carrier + k) * df for k in range(self.n_carriers)
        )

    @property
    def preamble_samples(self) -> int:
        return self.preamble_repeats * self.symbol_samples

    def coded_bits_for_data_bits(self, n_bits: int) -> int:
        if self.fec == "conv":
            from anet.dsp.fec import conv_encoded_bits, interleaved_bits

            return interleaved_bits(conv_encoded_bits(n_bits), self.fec_interleave)
        return n_bits

    def data_symbols_for_payload(self, payload_len: int) -> int:
        bits = data_section_coded_bits(self, payload_len)
        return -(-bits // self.bits_per_symbol)

    def frame_num_samples(self, payload_len: int) -> int:
        # preamble + pilot + data symbols
        return (
            self.preamble_samples
            + self.symbol_samples * (1 + self.data_symbols_for_payload(payload_len))
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "OfdmConfig":
        return cls(**json.loads(text))


# --- deterministic known sequences (protocol constants) ----------------------


def _pn_qpsk(config: OfdmConfig, seed: int, n_symbols: int = 1) -> jnp.ndarray:
    """Known unit-modulus QPSK sequence, [n_symbols, n_carriers] complex64."""
    rng = np.random.default_rng(seed)
    phases = rng.integers(0, 4, (n_symbols, config.n_carriers))
    return jnp.asarray(np.exp(1j * (np.pi / 2 * phases + np.pi / 4)), jnp.complex64)


def pilot_carriers(config: OfdmConfig) -> jnp.ndarray:
    """The known pilot symbol's carrier values (seeded by the magic word)."""
    return _pn_qpsk(config, 0x2C5DA044)[0]


def preamble_carriers(config: OfdmConfig) -> jnp.ndarray:
    return _pn_qpsk(config, 0x2C5DA044 ^ 0xFFFF)[0]


# --- synthesis ---------------------------------------------------------------


@lru_cache(maxsize=16)
def _synth_basis(
    n_fft: int, cp_len: int, first_carrier: int, n_carriers: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sparse-carrier inverse-DFT bases, CP folded in: [C, cp_len + n_fft].

    Only ``n_carriers`` of the n_fft/2 spectrum bins are ever nonzero, so
    synthesis is a [.., C] x [C, symbol] matmul instead of a full irfft —
    the MXU form (jnp.fft.irfft is additionally UNIMPLEMENTED on some TPU
    runtimes, so this also makes the OFDM transmitter chip-native). The
    cyclic prefix is the same cosines evaluated cp_len samples early
    (cos/sin are N-periodic), so it costs zero extra ops — the basis rows
    simply start at t = -cp_len.
    """
    t = np.arange(-cp_len, n_fft, dtype=np.float64)
    m = first_carrier + np.arange(n_carriers, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(m, t) / n_fft  # [C, cp+N]
    a = (2.0 / n_fft) * np.cos(ang)
    b = -(2.0 / n_fft) * np.sin(ang)
    return a.astype(np.float32), b.astype(np.float32)


def _symbols_to_waveform(config: OfdmConfig, carriers: jnp.ndarray) -> jnp.ndarray:
    """complex [..., S, n_carriers] -> real [..., S * symbol_samples].

    time[t] = (2/N) sum_m (Re X_m cos(2 pi m t / N) - Im X_m sin(...)) —
    the Hermitian-symmetric inverse DFT restricted to the active carriers,
    as one real matmul per quadrature (see _synth_basis).
    """
    shape = carriers.shape[:-1]
    a_np, b_np = _synth_basis(
        config.n_fft, config.cp_len, config.first_carrier, config.n_carriers
    )
    with_cp = jnp.matmul(
        jnp.real(carriers), jnp.asarray(a_np), preferred_element_type=jnp.float32
    ) + jnp.matmul(
        jnp.imag(carriers), jnp.asarray(b_np), preferred_element_type=jnp.float32
    )  # [..., S, cp+N]
    flat = with_cp.reshape(*shape[:-1], shape[-1] * config.symbol_samples)
    # Unit-QPSK carriers give RMS sqrt(2C)/N; scale so the waveform RMS is
    # amplitude/4 — with OFDM's ~12 dB peak-to-average ratio, `amplitude`
    # then approximates the typical peak level.
    scale = (config.amplitude / 4.0) * config.n_fft / np.sqrt(2.0 * config.n_carriers)
    return (flat * scale).astype(jnp.float32)


def preamble_waveform(config: OfdmConfig) -> jnp.ndarray:
    """The known preamble template: preamble_repeats identical symbols."""
    c = preamble_carriers(config)[None, :]
    one = _symbols_to_waveform(config, c)
    return jnp.tile(one, config.preamble_repeats)


def bits_to_qpsk(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 [..., 2K] -> complex [..., K]; Gray map, (b0, b1) -> (I, Q)."""
    pairs = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 2, 2).astype(jnp.float32)
    i = 1.0 - 2.0 * pairs[..., 0]
    q = 1.0 - 2.0 * pairs[..., 1]
    return ((i + 1j * q) / np.sqrt(2)).astype(jnp.complex64)


# Gray-mapped 4-PAM amplitudes per axis for 16-QAM: bit pair (sign, inner)
# 00 -> -3, 01 -> -1, 11 -> +1, 10 -> +3, unit average symbol power overall.
_QAM16_SCALE = 1.0 / np.sqrt(10.0)


def _pam4(b_sign: jnp.ndarray, b_inner: jnp.ndarray) -> jnp.ndarray:
    sign = 2.0 * b_sign.astype(jnp.float32) - 1.0  # 0 -> -1, 1 -> +1
    mag = 3.0 - 2.0 * b_inner.astype(jnp.float32)  # 0 -> 3, 1 -> 1
    return sign * mag * _QAM16_SCALE


def bits_to_qam16(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 [..., 4K] -> complex [..., K]; Gray per axis,
    (b0, b1) -> I, (b2, b3) -> Q."""
    quads = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 4, 4)
    i = _pam4(quads[..., 0], quads[..., 1])
    q = _pam4(quads[..., 2], quads[..., 3])
    return (i + 1j * q).astype(jnp.complex64)


# Gray-mapped 8-PAM amplitudes per axis for 64-QAM: bit triple
# (sign, mid, inner) -> reflected-Gray amplitude; unit average symbol power.
#   (0,00) -> -7  (0,01) -> -5  (0,11) -> -3  (0,10) -> -1
#   (1,10) -> +1  (1,11) -> +3  (1,01) -> +5  (1,00) -> +7
_QAM64_SCALE = 1.0 / np.sqrt(42.0)


def _pam8(b_sign: jnp.ndarray, b_mid: jnp.ndarray, b_inner: jnp.ndarray) -> jnp.ndarray:
    sign = 2.0 * b_sign.astype(jnp.float32) - 1.0  # 0 -> -1, 1 -> +1
    m = b_mid.astype(jnp.int32)
    # Gray-decode (mid, inner): 00 -> 0, 01 -> 1, 11 -> 2, 10 -> 3
    v = 2 * m + (m ^ b_inner.astype(jnp.int32))
    mag = 7.0 - 2.0 * v.astype(jnp.float32)  # 7, 5, 3, 1
    return sign * mag * _QAM64_SCALE


def bits_to_qam64(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 [..., 6K] -> complex [..., K]; Gray per axis,
    (b0, b1, b2) -> I, (b3, b4, b5) -> Q."""
    six = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 6, 6)
    i = _pam8(six[..., 0], six[..., 1], six[..., 2])
    q = _pam8(six[..., 3], six[..., 4], six[..., 5])
    return (i + 1j * q).astype(jnp.complex64)


def bits_to_carriers(config: OfdmConfig, bits: jnp.ndarray) -> jnp.ndarray:
    if config.bits_per_carrier == 6:
        return bits_to_qam64(bits)
    if config.bits_per_carrier == 4:
        return bits_to_qam16(bits)
    return bits_to_qpsk(bits)


def _pam4_llrs(a: jnp.ndarray, weight: jnp.ndarray):
    """Max-log LLRs for one Gray 4-PAM axis (positive = bit 1).

    ``a`` is the equalized amplitude estimate (unit constellation scale);
    ``weight`` restores per-carrier channel reliability.
    """
    llr_sign = a * weight  # bit 1 <=> positive side
    llr_inner = (2.0 * _QAM16_SCALE - jnp.abs(a)) * weight  # bit 1 <=> inner
    return llr_sign, llr_inner


def _pam8_llrs(a: jnp.ndarray, weight: jnp.ndarray):
    """Max-log LLRs for one Gray 8-PAM axis (positive = bit 1).

    Decision boundaries in unit-constellation scale: sign at 0, mid bit at
    |a| = 4 (bit 1 inside), inner bit at |a| = 2 and 6 (bit 1 between).
    """
    mag = jnp.abs(a)
    llr_sign = a * weight
    llr_mid = (4.0 * _QAM64_SCALE - mag) * weight
    llr_inner = (2.0 * _QAM64_SCALE - jnp.abs(mag - 4.0 * _QAM64_SCALE)) * weight
    return llr_sign, llr_mid, llr_inner


def transmit(config: OfdmConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """payload uint8[..., N] -> frame waveform float32[..., frame_samples].

    Shares the MFSK frame's byte layout and coding
    (anet.dsp.frame.data_section_air_bits_array).
    """
    n = payload.shape[-1]
    bits = data_section_air_bits_array(config, payload)
    # pad to whole OFDM symbols
    s_data = config.data_symbols_for_payload(n)
    pad = s_data * config.bits_per_symbol - bits.shape[-1]
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1
        )
    carriers = bits_to_carriers(config, bits).reshape(
        *bits.shape[:-1], s_data, config.n_carriers
    )
    pilot = jnp.broadcast_to(
        pilot_carriers(config), bits.shape[:-1] + (1, config.n_carriers)
    )
    data_wave = _symbols_to_waveform(
        config, jnp.concatenate([pilot, carriers], axis=-2)
    )
    pre = jnp.broadcast_to(
        preamble_waveform(config), bits.shape[:-1] + (config.preamble_samples,)
    )
    return jnp.concatenate([pre, data_wave], axis=-1)


# --- demodulation ------------------------------------------------------------


def _timing_bias(config: OfdmConfig) -> int:
    """FFT-window advance into the cyclic prefix, in samples.

    A window that starts exactly at the symbol boundary has zero tolerance
    for LATE timing: any forward slip (receiver clock fast, matched-filter
    alignment one sample off) pulls the next symbol's first samples into
    the window — inter-symbol interference the CP cannot absorb, because
    the CP only cyclically extends the symbol BACKWARD in time. Starting
    every window ``bias`` samples early instead keeps it inside the CP
    (a pure cyclic shift, i.e. a per-carrier rotation e^{-j2pi*m*bias/N}
    identical on every symbol — cancelled entirely by the pilot-relative
    equalizer) and buys ``bias`` samples of forward-slip margin, at the
    cost of ``bias`` samples of echo margin (cp_len - bias remains).
    """
    return config.cp_len // 4


@lru_cache(maxsize=16)
def _analysis_basis(
    n_fft: int, first_carrier: int, n_carriers: int, bias: int
) -> np.ndarray:
    """Sparse-carrier DFT basis [n_fft, 2 * n_carriers] (Re | Im columns).

    W[t, m] = e^{-2 pi i m (t - bias) / N}: the forward DFT restricted to
    the active carriers with the early-window deramp rotation
    e^{+2 pi i m bias / N} folded into the matrix. One real matmul
    replaces rfft + bin slice + complex rotate — only ~2C of the N/2
    spectrum bins were ever used, and the matmul form runs on the MXU
    (rfft lowers through the TPU's slow FFT path).
    """
    t = np.arange(n_fft, dtype=np.float64) - bias
    m = first_carrier + np.arange(n_carriers, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(t, m) / n_fft  # [N, C]
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def _extract_carriers(config: OfdmConfig, samples: jnp.ndarray, n_symbols: int) -> jnp.ndarray:
    """Symbol-aligned real samples -> complex carriers [..., S, n_carriers]."""
    bias = _timing_bias(config)
    sym = samples[..., : n_symbols * config.symbol_samples].reshape(
        *samples.shape[:-1], n_symbols, config.symbol_samples
    )
    no_cp = sym[..., config.cp_len - bias : config.symbol_samples - bias]
    w = jnp.asarray(
        _analysis_basis(
            config.n_fft, config.first_carrier, config.n_carriers, bias
        )
    )
    spec = jnp.matmul(no_cp, w, preferred_element_type=jnp.float32)  # [.., S, 2C]
    c = config.n_carriers
    return jax.lax.complex(spec[..., :c], spec[..., c:])


def _nearest_odd(a: jnp.ndarray, max_level: float) -> jnp.ndarray:
    """Quantize to the nearest odd integer in [-max_level, max_level]."""
    return jnp.clip(2.0 * jnp.round((a - 1.0) / 2.0) + 1.0, -max_level, max_level)


def _hard_decision(config: OfdmConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Nearest constellation point (unit average power) for z_eq estimates."""
    re, im = jnp.real(z), jnp.imag(z)
    if config.bits_per_carrier == 6:
        return (
            _nearest_odd(re / _QAM64_SCALE, 7.0) + 1j * _nearest_odd(im / _QAM64_SCALE, 7.0)
        ).astype(jnp.complex64) * _QAM64_SCALE
    if config.bits_per_carrier == 4:
        return (
            _nearest_odd(re / _QAM16_SCALE, 3.0) + 1j * _nearest_odd(im / _QAM16_SCALE, 3.0)
        ).astype(jnp.complex64) * _QAM16_SCALE
    s = 1.0 / np.sqrt(2.0)
    return (
        jnp.where(re >= 0, s, -s) + 1j * jnp.where(im >= 0, s, -s)
    ).astype(jnp.complex64)


def preamble_phase_slope(config: OfdmConfig, samples: jnp.ndarray) -> jnp.ndarray:
    """Decision-free clock-drift slope from the repeated preamble symbols.

    The preamble transmits ``preamble_repeats`` identical OFDM symbols one
    symbol period L apart (Schmidl-Cox structure). A sample-clock offset
    delta slips the second copy by delta*L samples, rotating its carrier m
    by 2*pi*m*(delta*L)/N relative to the first — so the per-carrier ratio
    Y2 * conj(Y1) has phase slope c = 2*pi*delta*L/N per carrier index,
    exactly the per-symbol slope the data symbols will accumulate. The
    adjacent-carrier differential averages the slope without phase
    unwrapping. Returns c (radians per carrier index per symbol), 0 when
    the preamble has no repeat.
    """
    if config.preamble_repeats < 2:
        return jnp.zeros(samples.shape[:-1], jnp.float32)
    pre = samples[..., : config.preamble_samples]
    y = _extract_carriers(config, pre, config.preamble_repeats)
    r = y[..., 1, :] * jnp.conj(y[..., 0, :])  # [..., C], phase = c*m
    # coarse: adjacent-carrier differential (wrap-free but short-baseline,
    # so noisy — each diff multiplies four noisy spectra)
    d = r[..., 1:] * jnp.conj(r[..., :-1])  # phase = c, |d| = reliability
    c0 = jnp.angle(jnp.sum(d, axis=-1)).astype(jnp.float32)
    # refine: remove the coarse slope, then fit the small residual phases
    # against the full absolute-carrier baseline (through the origin — a
    # pure timing slip has exactly zero phase at DC). The long baseline
    # cuts the estimator noise ~8x vs the differential alone.
    m = (config.first_carrier + jnp.arange(config.n_carriers)).astype(jnp.float32)
    phi = jnp.angle(r * jnp.exp(-1j * c0[..., None] * m))
    w = jnp.abs(r)
    num = jnp.sum(w * m * phi, axis=-1)
    den = jnp.maximum(jnp.sum(w * m * m, axis=-1), 1e-20)
    c = c0 + num / den
    # Wrap gate: at low SNR the coarse estimate has heavy tails (measured
    # errors of 0.07 rad at 6 dB); beyond ~pi/m_max the residual phases
    # wrap and the refine locks onto garbage — which then costs far more
    # than the drift it would correct (the error is amplified by (s+1)*m
    # across the whole frame). The weighted residual coherence separates
    # the two regimes cleanly: measured >= 0.91 on every sound estimate
    # (6-24 dB, 0-400 ppm) and ~0 when wrapped, so a gate at 0.5-0.8
    # passes all real measurements and zeroes the poison pills. A zeroed
    # seed just means tracking no-ops for that frame.
    resid = phi - (num / den)[..., None] * m
    coh = jnp.sum(w * jnp.cos(resid), axis=-1) / jnp.maximum(
        jnp.sum(w, axis=-1), 1e-20
    )
    gate = jnp.clip((coh - 0.5) / 0.3, 0.0, 1.0)
    return (c * gate).astype(jnp.float32)


def estimate_drift_ppm(config: OfdmConfig, samples: jnp.ndarray) -> jnp.ndarray:
    """Sample-clock offset estimate (ppm) from an aligned frame's preamble."""
    c = preamble_phase_slope(config, samples)
    return c * config.n_fft / (2.0 * np.pi * config.symbol_samples) * 1e6


def _phase_track(
    config: OfdmConfig,
    z_eq: jnp.ndarray,
    weights: jnp.ndarray,
    slope0: jnp.ndarray,
) -> jnp.ndarray:
    """Per-symbol derotation phasors for clock-drift compensation.

    Data symbol s (0-based, pilot = s = -1) carries phase c*(s+1)*m across
    absolute carrier index m = first_carrier + k, where c is the slope per
    symbol (see preamble_phase_slope). Crystal drift is constant over a
    frame, so instead of a sequential tracking loop (whose per-symbol
    corrections inject measurement noise into the constellation), fit the
    single parameter c to ALL symbols at once and iterate twice:

      1. derotate by the current c (preamble seed first), hard-decide;
      2. every point's residual phase angle(z*conj(decision)) measures
         dc*(s+1)*m — small post-seed, so wrap-free;
      3. weighted least-squares through the origin over the JOINT
         (symbol x carrier) baseline updates c. The long lever arm — the
         top carrier of the last symbol weighs (s_data+1)*m_max — makes
         the fit an order of magnitude less noisy than the preamble seed,
         so tracking costs almost nothing at zero drift.

    The first iteration's decisions only need the seed to keep rotations
    inside the decision region (QPSK tolerates 45 degrees even at the top
    carrier); the second iteration re-decides with the refined line.
    Fully parallel over symbols/carriers/streams — two elementwise
    passes, no scan.

    Returns unit phasors [..., S, C] to multiply into z (and z_eq).
    """
    m = (config.first_carrier + jnp.arange(config.n_carriers)).astype(jnp.float32)
    s_data = z_eq.shape[-2]
    sym = jnp.arange(1, s_data + 1, dtype=jnp.float32)  # pilot-relative index
    c = slope0.astype(jnp.float32)[..., None, None]  # [..., 1, 1]
    phase = sym[:, None] * m[None, :]  # [S, C] — (s+1)*m

    # (A per-carrier-base power chain — exp over [.., C] then integer
    # powers via cumprod or an unrolled multiply chain — was measured
    # SLOWER than the straight exp on a v5e: XLA fuses sin/cos into the
    # surrounding elementwise work, while the chain materializes S
    # complex [.., C] intermediates. Likewise a stride-4 carrier subset
    # for the fit — measured NO faster: the strided views relayout, and
    # the tracker is decision/complex-multiply-bound, not exp-bound.
    # Keep the direct full-grid form.)
    for _ in range(2):
        zc = z_eq * jnp.exp(-1j * c * phase).astype(jnp.complex64)
        u = weights * zc * jnp.conj(_hard_decision(config, zc))
        # Each point's residual phase phi ~ dc*(s+1)*m with reliability
        # |u|; the weighted LS update sum(|u|*phase*phi)/sum(|u|*phase^2)
        # reduces, to first order in phi, to the transcendental-free ML
        # form Im(u) ~ |u|*phi and Re(u) ~ |u| — no atan2 per point. The
        # approximation error is quadratic in the residual and the second
        # iteration re-decides with the refined line, so the fixed point
        # is unchanged.
        num = jnp.sum(phase * jnp.imag(u), axis=(-2, -1))
        den = jnp.maximum(
            jnp.sum(phase * phase * jnp.maximum(jnp.real(u), 0.0), axis=(-2, -1)),
            1e-20,
        )
        c = c + (num / den)[..., None, None]

    rot = jnp.exp(-1j * c * phase).astype(jnp.complex64)
    # Identity gate (round 5): the preamble seed has heavy UNWRAPPED
    # error tails at low SNR (measured 0.002-0.008 rad/carrier/symbol at
    # 6 dB — 5-20x the sound-estimate tail — which preamble_phase_slope's
    # wrap gate cannot see), and the decision-directed fit LOCKS onto a
    # bad seed: once the seed rotation exceeds the decision region at the
    # long-baseline corner, the hard decisions align with the rotation
    # and the fit's fixed point reproduces the poison (measured: final c
    # == slope0 on every corrupted frame; ofdm-coded lost 14% of frames
    # at 4-8 dB, FER 0 with tracking off). Decide per frame whether the
    # fitted rotation actually helps: weighted decision coherence of the
    # tracked vs the UNROTATED constellation — a clean-clock frame with a
    # poison seed scores ~0.90 tracked vs ~0.93 untracked, while a truly
    # drifting frame scrambles untracked decisions and scores far lower.
    # Ties keep the identity, so zero-drift frames are never degraded.
    u0 = weights * z_eq * jnp.conj(_hard_decision(config, z_eq))
    z1 = z_eq * rot
    u1 = weights * z1 * jnp.conj(_hard_decision(config, z1))

    def _coh(u):
        return jnp.sum(jnp.real(u), axis=(-2, -1)) / jnp.maximum(
            jnp.sum(jnp.abs(u), axis=(-2, -1)), 1e-20
        )

    keep = (_coh(u1) > _coh(u0))[..., None, None]
    return jnp.where(keep, rot, jnp.ones((), jnp.complex64))


def _equalized_bits(config: OfdmConfig, samples: jnp.ndarray, s_data: int):
    """Aligned frame waveform -> (bits, llrs, z_eq) for ``s_data`` symbols.

    Shared front half of the fixed- and dynamic-length demodulators:
    pilot channel estimate, one-tap equalization, optional clock-drift
    phase tracking, Gray demapping.
    """
    body = samples[..., config.preamble_samples :]
    carriers = _extract_carriers(config, body, 1 + s_data)
    # channel estimate from the pilot symbol (one complex tap per carrier)
    h = carriers[..., 0, :] * jnp.conj(pilot_carriers(config))  # [..., C]
    if config.pilot_smoothing:
        h_pad = jnp.concatenate([h[..., :1], h, h[..., -1:]], axis=-1)
        h = 0.25 * h_pad[..., :-2] + 0.5 * h_pad[..., 1:-1] + 0.25 * h_pad[..., 2:]
    z = carriers[..., 1:, :] * jnp.conj(h[..., None, :])  # matched equalization
    h_pow = jnp.maximum(jnp.abs(h[..., None, :]) ** 2, 1e-12)
    z_eq = z / h_pow  # unit-constellation symbol estimate
    if config.clock_tracking:
        slope0 = preamble_phase_slope(config, samples)
        rot = _phase_track(config, z_eq, h_pow, slope0)  # [..., 1, C] weights
        z = z * rot
        z_eq = z_eq * rot
    if config.bits_per_carrier == 6:
        li = _pam8_llrs(jnp.real(z_eq), h_pow)
        lq = _pam8_llrs(jnp.imag(z_eq), h_pow)
        llrs = jnp.stack([*li, *lq], axis=-1).reshape(
            *z.shape[:-2], s_data * config.bits_per_symbol
        )
    elif config.bits_per_carrier == 4:
        li_s, li_i = _pam4_llrs(jnp.real(z_eq), h_pow)
        lq_s, lq_i = _pam4_llrs(jnp.imag(z_eq), h_pow)
        llrs = jnp.stack([li_s, li_i, lq_s, lq_i], axis=-1).reshape(
            *z.shape[:-2], s_data * config.bits_per_symbol
        )
    else:
        # Gray QPSK: bit0 from I, bit1 from Q; positive LLR = bit 1
        llr_i = -jnp.real(z)
        llr_q = -jnp.imag(z)
        llrs = jnp.stack([llr_i, llr_q], axis=-1).reshape(
            *z.shape[:-2], s_data * config.bits_per_symbol
        )
    bits = (llrs > 0).astype(jnp.uint8)
    return bits, llrs, z_eq


def _evm_metrics(config: OfdmConfig, bits: jnp.ndarray, z_eq: jnp.ndarray):
    """(confidence, snr_db) from the error vector after normalizing out the
    channel power."""
    ideal = bits_to_carriers(config, bits[..., : z_eq.shape[-2] * config.bits_per_symbol])
    evm2 = jnp.mean(jnp.abs(z_eq - ideal.reshape(z_eq.shape)) ** 2, axis=(-2, -1))
    return _evm_to_metrics(evm2)


def _evm_to_metrics(evm2: jnp.ndarray):
    snr_db = 10.0 * jnp.log10(jnp.maximum(1.0 / jnp.maximum(evm2, 1e-9), 1e-6))
    return 1.0 / (1.0 + evm2), snr_db


def _equalized_llrs_fused(
    config: OfdmConfig, samples: jnp.ndarray, s_data: int, evm_symbols: int
):
    """TPU path of the equalizer back half: carrier extraction and channel
    estimate in XLA (matmul-dominated), then one Pallas kernel for
    clock-track + LLR demap + EVM (anet.kernels.ofdm_track_decide_fused)
    — the [B, S, C] complex intermediates of the two decision-directed
    fit iterations never round-trip HBM. Golden-tested equal to
    _equalized_bits + _evm_metrics."""
    from anet.kernels import ofdm_track_decide_fused

    body = samples[..., config.preamble_samples :]
    carriers = _extract_carriers(config, body, 1 + s_data)
    h = carriers[..., 0, :] * jnp.conj(pilot_carriers(config))
    if config.pilot_smoothing:
        h_pad = jnp.concatenate([h[..., :1], h, h[..., -1:]], axis=-1)
        h = 0.25 * h_pad[..., :-2] + 0.5 * h_pad[..., 1:-1] + 0.25 * h_pad[..., 2:]
    z = carriers[..., 1:, :] * jnp.conj(h[..., None, :])
    h_pow = jnp.maximum(jnp.abs(h) ** 2, 1e-12)  # [..., C]
    z_eq = z / h_pow[..., None, :]
    if config.clock_tracking:
        slope0 = preamble_phase_slope(config, samples)
    else:
        slope0 = jnp.zeros(z_eq.shape[:-2], jnp.float32)
    llrs, evm2 = ofdm_track_decide_fused(
        config, z_eq, h_pow, slope0, evm_symbols=evm_symbols
    )
    bits = (llrs > 0).astype(jnp.uint8)
    return bits, llrs, evm2


def _use_fused_track() -> bool:
    """Whether demodulate_frame routes through ofdm_track_decide_fused.

    OFF by default everywhere as of round 4: the kernel is golden-equal
    (tools/tpu_validate.py) but MEASURED ~2000x SLOWER than the jnp
    equalizer on this chip (10,065 ms vs 5.34 ms per iteration, tracked
    ofdm-fast at B=16384 — tools/exp_ofdm2.py; round 3 auto-dispatched it
    without a perf number, which dragged every OFDM bench entry down).
    The jnp tracker path measures 14.7 Gsamp/s tracked / 24.2 untracked
    at B=16384. Set ANET_OFDM_FUSED=1 to re-enable for experiments.
    """
    import os

    return bool(os.environ.get("ANET_OFDM_FUSED")) and jax.default_backend() == "tpu"


def demodulate_frame(
    config: OfdmConfig, samples: jnp.ndarray, payload_len: int
) -> FrameResult:
    """Aligned frame waveform (starting at the preamble) -> FrameResult."""
    s_data = config.data_symbols_for_payload(payload_len)
    if _use_fused_track():
        bits, llrs, evm2 = _equalized_llrs_fused(config, samples, s_data, s_data)
        confidence, snr_db = _evm_to_metrics(evm2)
    else:
        bits, llrs, z_eq = _equalized_bits(config, samples, s_data)
        confidence, snr_db = _evm_metrics(config, bits, z_eq)
    return frame_result_from_bits(
        config, bits, payload_len, llrs=llrs, confidence=confidence, snr_db=snr_db
    )


def demodulate_frame_dynamic(
    config: OfdmConfig, samples: jnp.ndarray, max_payload_len: int
) -> DynamicFrameResult:
    """Aligned max-length frame window -> payload + header-declared length.

    OFDM counterpart of anet.dsp.frame.demodulate_frame_dynamic: same
    equalizer front end sized for the maximum, shared dynamic parse.
    Quality metrics use the overhead-only symbol span — the only region
    guaranteed to carry signal at any declared length.
    """
    s_data = config.data_symbols_for_payload(max_payload_len)
    s_min = config.data_symbols_for_payload(0)
    if _use_fused_track():
        bits, _, evm2 = _equalized_llrs_fused(config, samples, s_data, s_min)
        confidence, snr_db = _evm_to_metrics(evm2)
    else:
        bits, _, z_eq = _equalized_bits(config, samples, s_data)
        confidence, snr_db = _evm_metrics(config, bits, z_eq[..., :s_min, :])
    return frame_result_from_bits_dynamic(
        config, bits, max_payload_len, confidence=confidence, snr_db=snr_db
    )


class OfdmReceiveResult(NamedTuple):
    frame: FrameResult
    offset: jnp.ndarray
    quality: jnp.ndarray


def receive_frame(
    config: OfdmConfig, capture: jnp.ndarray, payload_len: int
) -> OfdmReceiveResult:
    """Locate (matched filter) and demodulate one OFDM frame in a capture."""
    t = config.frame_num_samples(payload_len)
    n = capture.shape[-1]
    if n < t:
        raise ValueError(f"capture of {n} samples cannot hold a {t}-sample frame")
    template = preamble_waveform(config)
    corr = correlate_template(capture, template, method="auto")
    k = template.shape[-1]
    energy = sliding_window_energy(capture, k)
    t_energy = jnp.sum(template * template)
    quality = normalized_match_quality(corr, energy, t_energy)
    offset = jnp.argmax(quality, axis=-1).astype(jnp.int32)
    best_q = jnp.take_along_axis(quality, offset[..., None], axis=-1)[..., 0]
    start = jnp.clip(offset, 0, n - t)
    from anet.dsp.sync import aligned_gather

    aligned = aligned_gather(capture, start, t)
    frame = demodulate_frame(config, aligned, payload_len)
    return OfdmReceiveResult(frame=frame, offset=offset, quality=best_q)


# --- time-major receive pipeline ---------------------------------------------
#
# TIME-MAJOR [T, B] variants of the receive chain, mirroring
# anet.dsp.frame.demodulate_frame_tm: the stream batch lives in the minor
# (lane) dimension, so the [T, B] -> [S, symbol_samples, B] symbol split
# is a major-dimension view (no lane relayout), the sparse-carrier DFT
# contracts over sublanes, and every equalizer/tracker elementwise op
# keeps full 128-lane tiles with carriers in sublanes. Only the final
# per-bit LLRs and the EVM carrier estimates transpose back to
# batch-major (a fraction of the input bytes), where the shared frame
# parser finishes.


def _extract_carriers_tm(
    config: OfdmConfig, samples_tm: jnp.ndarray, n_symbols: int
) -> jnp.ndarray:
    """[T', B] symbol-aligned real samples -> complex [S, n_carriers, B]."""
    bias = _timing_bias(config)
    ss = config.symbol_samples
    b = samples_tm.shape[-1]
    sym = samples_tm[: n_symbols * ss].reshape(n_symbols, ss, b)
    no_cp = sym[:, config.cp_len - bias : ss - bias, :]  # [S, N, B]
    w = jnp.asarray(
        _analysis_basis(config.n_fft, config.first_carrier, config.n_carriers, bias)
    )
    spec = jnp.einsum(
        "snb,nc->scb", no_cp, w, preferred_element_type=jnp.float32
    )  # [S, 2C, B]
    c = config.n_carriers
    return jax.lax.complex(spec[:, :c], spec[:, c:])


def _preamble_phase_slope_tm(config: OfdmConfig, samples_tm: jnp.ndarray) -> jnp.ndarray:
    """preamble_phase_slope for [T, B] input; returns [B] slopes."""
    if config.preamble_repeats < 2:
        return jnp.zeros(samples_tm.shape[-1], jnp.float32)
    pre = samples_tm[: config.preamble_samples]
    y = _extract_carriers_tm(config, pre, config.preamble_repeats)  # [2, C, B]
    r = y[1] * jnp.conj(y[0])  # [C, B], phase = c*m
    d = r[1:] * jnp.conj(r[:-1])
    c0 = jnp.angle(jnp.sum(d, axis=0)).astype(jnp.float32)  # [B]
    m = (config.first_carrier + jnp.arange(config.n_carriers)).astype(jnp.float32)
    m = m[:, None]
    phi = jnp.angle(r * jnp.exp(-1j * c0[None, :] * m))
    w = jnp.abs(r)
    num = jnp.sum(w * m * phi, axis=0)
    den = jnp.maximum(jnp.sum(w * m * m, axis=0), 1e-20)
    c = c0 + num / den
    resid = phi - (num / den)[None, :] * m
    coh = jnp.sum(w * jnp.cos(resid), axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-20)
    gate = jnp.clip((coh - 0.5) / 0.3, 0.0, 1.0)
    return (c * gate).astype(jnp.float32)


def _phase_track_tm(
    config: OfdmConfig,
    z_eq: jnp.ndarray,
    weights: jnp.ndarray,
    slope0: jnp.ndarray,
) -> jnp.ndarray:
    """_phase_track for [S, C, B] layout; returns unit phasors [S, C, B]."""
    m = (config.first_carrier + jnp.arange(config.n_carriers)).astype(jnp.float32)
    s_data = z_eq.shape[0]
    sym = jnp.arange(1, s_data + 1, dtype=jnp.float32)
    phase = (sym[:, None] * m[None, :])[..., None]  # [S, C, 1]
    c = slope0.astype(jnp.float32)[None, None, :]  # [1, 1, B]

    for _ in range(2):
        zc = z_eq * jnp.exp(-1j * c * phase).astype(jnp.complex64)
        u = weights * zc * jnp.conj(_hard_decision(config, zc))
        num = jnp.sum(phase * jnp.imag(u), axis=(0, 1))
        den = jnp.maximum(
            jnp.sum(phase * phase * jnp.maximum(jnp.real(u), 0.0), axis=(0, 1)),
            1e-20,
        )
        c = c + (num / den)[None, None, :]

    rot = jnp.exp(-1j * c * phase).astype(jnp.complex64)
    # identity gate — see _phase_track (poison-seed lock-in at low SNR)
    u0 = weights * z_eq * jnp.conj(_hard_decision(config, z_eq))
    z1 = z_eq * rot
    u1 = weights * z1 * jnp.conj(_hard_decision(config, z1))

    def _coh(u):
        return jnp.sum(jnp.real(u), axis=(0, 1)) / jnp.maximum(
            jnp.sum(jnp.abs(u), axis=(0, 1)), 1e-20
        )

    keep = (_coh(u1) > _coh(u0))[None, None, :]
    return jnp.where(keep, rot, jnp.ones((), jnp.complex64))


def _equalized_bits_tm(config: OfdmConfig, samples_tm: jnp.ndarray, s_data: int):
    """[T, B] aligned frame waveforms -> (bits, llrs, z_eq) batch-major.

    The time-major twin of _equalized_bits; numerically identical within
    f32 rounding (golden-tested), with all hot ops in [S, C, B] layout.
    """
    body = samples_tm[config.preamble_samples :]
    carriers = _extract_carriers_tm(config, body, 1 + s_data)  # [S1, C, B]
    h = carriers[0] * jnp.conj(pilot_carriers(config))[:, None]  # [C, B]
    if config.pilot_smoothing:
        h_pad = jnp.concatenate([h[:1], h, h[-1:]], axis=0)
        h = 0.25 * h_pad[:-2] + 0.5 * h_pad[1:-1] + 0.25 * h_pad[2:]
    z = carriers[1:] * jnp.conj(h)[None]  # [S, C, B]
    h_pow = jnp.maximum(jnp.abs(h[None]) ** 2, 1e-12)  # [1, C, B]
    z_eq = z / h_pow
    if config.clock_tracking:
        slope0 = _preamble_phase_slope_tm(config, samples_tm)
        rot = _phase_track_tm(config, z_eq, h_pow, slope0)
        z = z * rot
        z_eq = z_eq * rot
    if config.bits_per_carrier == 6:
        li = _pam8_llrs(jnp.real(z_eq), h_pow)
        lq = _pam8_llrs(jnp.imag(z_eq), h_pow)
        per_bit = jnp.stack([*li, *lq], axis=2)  # [S, C, 6, B]
    elif config.bits_per_carrier == 4:
        li_s, li_i = _pam4_llrs(jnp.real(z_eq), h_pow)
        lq_s, lq_i = _pam4_llrs(jnp.imag(z_eq), h_pow)
        per_bit = jnp.stack([li_s, li_i, lq_s, lq_i], axis=2)  # [S, C, 4, B]
    else:
        per_bit = jnp.stack([-jnp.real(z), -jnp.imag(z)], axis=2)  # [S, C, 2, B]
    # The only layout crossings: per-bit LLRs and the EVM estimates go
    # batch-major for the shared parser (a fraction of the input bytes).
    llrs = jnp.moveaxis(per_bit, -1, 0).reshape(
        samples_tm.shape[-1], s_data * config.bits_per_symbol
    )
    bits = (llrs > 0).astype(jnp.uint8)
    z_eq_bm = jnp.moveaxis(z_eq, -1, 0)  # [B, S, C]
    return bits, llrs, z_eq_bm


def demodulate_frame_tm(
    config: OfdmConfig, samples_tm: jnp.ndarray, payload_len: int
) -> FrameResult:
    """demodulate_frame for TIME-MAJOR [T, B] input (see module section
    docstring); returns the same batch-major FrameResult."""
    s_data = config.data_symbols_for_payload(payload_len)
    bits, llrs, z_eq = _equalized_bits_tm(config, samples_tm, s_data)
    confidence, snr_db = _evm_metrics(config, bits, z_eq)
    return frame_result_from_bits(
        config, bits, payload_len, llrs=llrs, confidence=confidence, snr_db=snr_db
    )
