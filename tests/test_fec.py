"""Convolutional FEC tests: encoder, batched Viterbi, frame integration."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anet.channel import awgn
from anet.dsp import ModemConfig
from anet.dsp import fec
from anet.dsp.fec import (
    CONV_TAIL_BITS,
    conv_encode,
    conv_encoded_bits,
    viterbi_decode,
)
from anet.dsp.frame import demodulate_frame, frame_num_samples
from anet.dsp.pipeline import loopback, transmit

CFG_RAW = ModemConfig(symbol_rate_hz=1500, num_tones=4, preamble_symbols=16)
CFG_FEC = dataclasses.replace(CFG_RAW, fec="conv")


def test_encoder_geometry_and_tail():
    bits = jnp.asarray(np.random.default_rng(0).integers(0, 2, (2, 100), np.uint8))
    coded = conv_encode(bits)
    assert coded.shape == (2, conv_encoded_bits(100)) == (2, 2 * (100 + CONV_TAIL_BITS))
    # all-zero input stays all-zero (linear code)
    assert int(conv_encode(jnp.zeros((1, 50), jnp.uint8)).sum()) == 0


def test_viterbi_clean_and_corrected_roundtrip():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (4, 300), np.uint8))
    coded = conv_encode(bits)
    assert bool(jnp.all(viterbi_decode(coded, 300) == bits))
    # 3% random channel errors must decode perfectly at K=7 r=1/2
    flips = jnp.asarray(rng.random(coded.shape) < 0.03).astype(jnp.uint8)
    assert bool(jnp.all(viterbi_decode(coded ^ flips, 300) == bits))


def test_viterbi_short_burst_corrected():
    """d_free = 10: up to 4 errors in one constraint span are correctable.
    (Long bursts defeat any convolutional code without interleaving.)"""
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, 400, np.uint8))
    coded = np.array(conv_encode(bits))
    coded[100:103] ^= 1  # 3-bit burst
    coded[400:402] ^= 1  # and a 2-bit burst far away
    out = viterbi_decode(jnp.asarray(coded), 400)
    assert bool(jnp.all(out == bits))


def test_config_fec_validation_and_json():
    with pytest.raises(ValueError, match="fec"):
        ModemConfig(fec="hamming")
    assert ModemConfig.from_json(CFG_FEC.to_json()) == CFG_FEC


def test_fec_frame_is_twice_as_long_on_air():
    raw = frame_num_samples(CFG_RAW, 64)
    coded = frame_num_samples(CFG_FEC, 64)
    assert 1.9 < (coded - 0) / raw < 2.1


def test_fec_frame_clean_loopback():
    payload = jnp.asarray(np.random.default_rng(3).integers(0, 256, 64, np.uint8))
    res = loopback(CFG_FEC, payload, pad_before=123)
    assert bool(res.frame.ok)
    assert np.array_equal(np.asarray(res.frame.payload), np.asarray(payload))


def test_coding_gain_at_the_fer_cliff():
    """At -2 dB this 4-FSK link is dead without FEC and clean with it."""
    payloads = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (16, 64), np.uint8)
    )
    fer = {}
    for cfg, tag in ((CFG_RAW, "raw"), (CFG_FEC, "fec")):
        waves = transmit(cfg, payloads)
        noisy = awgn(jax.random.PRNGKey(980), waves, -2.0)
        r = demodulate_frame(cfg, noisy, 64)
        fer[tag] = float(jnp.mean(1 - r.ok.astype(jnp.float32)))
    assert fer["raw"] > 0.7
    assert fer["fec"] < 0.2


def test_fec_with_clock_tracking():
    """FEC decode sits behind frame_result_from_decisions, so the tracked
    demodulator gets it for free — verify the composition."""
    from anet.channel import sample_rate_drift
    from anet.dsp.pipeline import receive_frame_tracked

    payload = jnp.asarray(np.random.default_rng(5).integers(0, 256, 48, np.uint8))
    wave = transmit(CFG_FEC, payload)
    cap = jnp.concatenate([jnp.zeros(200), wave, jnp.zeros(1500)])
    cap = awgn(jax.random.PRNGKey(6), sample_rate_drift(cap, 400.0), 8.0)
    res = receive_frame_tracked(CFG_FEC, cap, 48)
    assert bool(res.frame.ok)
    assert np.array_equal(np.asarray(res.frame.payload), np.asarray(payload))


def test_bit_llr_signs_match_clean_bits():
    from anet.dsp.bits import unpack_symbols
    from anet.dsp.demod import bit_llrs, tone_energies
    from anet.dsp.mod import modulate_symbols

    rng = np.random.default_rng(7)
    syms = jnp.asarray(rng.integers(0, CFG_RAW.num_tones, 150))
    e = tone_energies(CFG_RAW, modulate_symbols(CFG_RAW, syms))
    llr = np.asarray(bit_llrs(CFG_RAW, e))
    true_bits = np.asarray(unpack_symbols(syms, CFG_RAW.bits_per_symbol))
    assert np.array_equal(llr > 0, true_bits == 1)


def test_soft_viterbi_beats_hard():
    from anet.dsp.fec import viterbi_decode_soft

    rng = np.random.default_rng(8)
    bits = jnp.asarray(rng.integers(0, 2, 500, np.uint8))
    coded = np.asarray(conv_encode(bits), np.float32)
    soft_rx = (2 * coded - 1) + rng.normal(0, 0.9, coded.shape).astype(np.float32)
    hard_rx = (soft_rx > 0).astype(np.uint8)
    hard_err = int((viterbi_decode(jnp.asarray(hard_rx), 500) != bits).sum())
    soft_err = int((viterbi_decode_soft(jnp.asarray(soft_rx), 500) != bits).sum())
    assert soft_err < hard_err
    assert soft_err <= 15


def test_soft_fec_frame_gain_below_hard_threshold():
    """-4 dB: hard-decision FEC left residual frame errors here; soft
    decisions from the filterbank energies decode cleanly."""
    payloads = jnp.asarray(np.random.default_rng(1).integers(0, 256, (16, 64), np.uint8))
    waves = transmit(CFG_FEC, payloads)
    noisy = awgn(jax.random.PRNGKey(46), waves, -4.0)
    r = demodulate_frame(CFG_FEC, noisy, 64)
    assert float(jnp.mean(r.ok.astype(jnp.float32))) >= 0.9


def test_interleaver_roundtrip_and_padding():
    from anet.dsp.fec import deinterleave, interleave, interleaved_bits

    rng = np.random.default_rng(9)
    bits = jnp.asarray(rng.integers(0, 2, (2, 101), np.uint8))
    for depth in (0, 1, 8, 24):
        out = interleave(bits, depth)
        assert out.shape[-1] == interleaved_bits(101, depth)
        back = deinterleave(out, depth, 101)
        assert np.array_equal(np.asarray(back), np.asarray(bits))


def test_interleaver_rescues_burst_that_kills_plain_fec():
    cfg_plain = CFG_FEC
    cfg_il = dataclasses.replace(CFG_FEC, fec_interleave=24)
    payload = jnp.asarray(np.random.default_rng(0).integers(0, 256, 64, np.uint8))
    results = {}
    for cfg in (cfg_plain, cfg_il):
        w = np.array(transmit(cfg, payload))
        sps = cfg.samples_per_symbol
        s0 = (cfg.preamble_symbols + 60) * sps
        w[s0 : s0 + 10 * sps] = 0.0  # 20 consecutive coded bits destroyed
        r = demodulate_frame(cfg, jnp.asarray(w), 64)
        results[cfg.fec_interleave] = bool(r.ok)
    assert results[0] is False  # plain conv code dies on the burst
    assert results[24] is True  # interleaved code shrugs it off


def test_interleaved_model_preset_loopback():
    from anet.models import get_model

    cfg = get_model("mfsk4-coded").config
    assert cfg.fec_interleave == 24
    payload = jnp.asarray(np.random.default_rng(2).integers(0, 256, 96, np.uint8))
    res = loopback(cfg, payload, pad_before=77)
    assert bool(res.frame.ok)


def test_frame_parse_hard_bits_fallback():
    """frame_result_from_bits must decode coded frames from hard bits alone
    (llrs=None) — the path a modulation without soft outputs would use."""
    from anet.dsp.bits import bits_to_bytes, bytes_to_bits, unpack_symbols
    from anet.dsp.demod import tone_energies, decide_symbols
    from anet.dsp.frame import frame_result_from_bits
    from anet.dsp.pipeline import transmit

    p = jnp.asarray(np.random.default_rng(11).integers(0, 256, 48, np.uint8))
    wave = transmit(CFG_FEC, p)
    sps = CFG_FEC.samples_per_symbol
    data = wave[CFG_FEC.preamble_symbols * sps :]
    e = tone_energies(CFG_FEC, data)
    bits = unpack_symbols(decide_symbols(CFG_FEC, e), CFG_FEC.bits_per_symbol)
    res = frame_result_from_bits(
        CFG_FEC, bits, 48,
        llrs=None,
        confidence=jnp.float32(1.0),
        snr_db=jnp.float32(99.0),
    )
    assert bool(res.ok)
    assert np.array_equal(np.asarray(res.payload), np.asarray(p))


def test_viterbi_pallas_matches_scan():
    """The fused Pallas trellis (interpret mode) is bit-exact against the
    jnp scan formulation, across batch shapes, message lengths (odd and
    lane-unaligned batches), and soft/hard inputs."""
    rng = np.random.default_rng(7)
    for b, nbits, noise in [(5, 96, 0.3), (3, 201, 0.5), (1, 17, 0.0)]:
        data = jnp.asarray(rng.integers(0, 2, (b, nbits)), jnp.uint8)
        coded = fec.conv_encode(data)
        llrs = jnp.asarray(
            (np.asarray(coded) * 2.0 - 1.0)
            + rng.normal(0, noise, coded.shape).astype(np.float32)
        )
        ref = fec.viterbi_decode_soft(llrs, nbits, use_pallas=False)
        got = fec.viterbi_decode_soft(llrs, nbits, use_pallas=True, interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), (b, nbits)
        hard_ref = fec.viterbi_decode(coded, nbits, use_pallas=False)
        hard_got = fec.viterbi_decode(coded, nbits, use_pallas=True, interpret=True)
        assert np.array_equal(np.asarray(hard_ref), np.asarray(hard_got))
        assert np.array_equal(np.asarray(hard_got), np.asarray(data))
