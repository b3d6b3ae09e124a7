"""Modem-chain tests: synthesis, filterbank demod, sync, framing, channel.

Covers BASELINE config 1 (the minimum end-to-end slice): modulate one
64-byte ip.proto frame, demodulate, byte-identical payload — plus noisy,
offset, multipath, and batched variants.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anet import constants
from anet.channel import ChannelConfig, apply_channel, awgn, dropout, multipath
from anet.dsp import ModemConfig
from anet.dsp.demod import demod_basis, demodulate_symbols, tone_energies
from anet.dsp.frame import frame_num_samples, modulate_frame, demodulate_frame
from anet.dsp.mod import modulate_symbols, synthesize_tones
from anet.dsp.pipeline import loopback, receive_frame, transmit
from anet.dsp.sync import locate_preamble, preamble_waveform
from anet.proto import AudioData, ToReceiver, encode_delimited

CFG = ModemConfig()  # 48 kHz, 750 baud, 16-FSK
CFG_SMALL = ModemConfig(symbol_rate_hz=1500, num_tones=4, preamble_symbols=16)


def random_payload(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8))


# --- config -----------------------------------------------------------------

def test_config_validation():
    with pytest.raises(ValueError, match="must divide"):
        ModemConfig(symbol_rate_hz=7)
    with pytest.raises(ValueError, match="power of two"):
        ModemConfig(num_tones=6)
    with pytest.raises(ValueError, match="Nyquist"):
        ModemConfig(base_freq_hz=23_000.0)


def test_config_json_roundtrip():
    cfg = ModemConfig(num_tones=8, symbol_rate_hz=375)
    assert ModemConfig.from_json(cfg.to_json()) == cfg


# --- synthesis --------------------------------------------------------------

def test_tone_synthesis_shape_and_amplitude():
    syms = jnp.asarray([0, 3, 1, 2])
    wave = synthesize_tones(CFG_SMALL, syms)
    assert wave.shape == (4 * CFG_SMALL.samples_per_symbol,)
    assert float(jnp.max(jnp.abs(wave))) <= CFG_SMALL.amplitude + 1e-5


def test_continuous_phase_has_no_jumps():
    cfg = ModemConfig(
        symbol_rate_hz=1500, num_tones=4, preamble_symbols=16, phase_continuous=True,
        base_freq_hz=3001.0,  # deliberately non-orthogonal start phase per symbol
    )
    syms = jnp.asarray(np.random.default_rng(0).integers(0, 4, 64))
    wave = np.asarray(synthesize_tones(cfg, syms))
    # max sample-to-sample step is bounded by the max instantaneous slope
    max_step = 2 * np.pi * cfg.max_tone_freq_hz / cfg.sample_rate_hz * cfg.amplitude
    assert np.max(np.abs(np.diff(wave))) <= max_step * 1.05


def test_basis_orthogonality():
    basis = np.asarray(demod_basis(CFG))
    gram = basis.T @ basis
    off = gram - np.diag(np.diag(gram))
    # orthogonal tone plan: cross-terms are numerically zero
    assert np.max(np.abs(off)) < 1e-2 * np.max(np.diag(gram))


# --- demod ------------------------------------------------------------------

@pytest.mark.parametrize("cfg", [CFG, CFG_SMALL])
@pytest.mark.parametrize("phase_continuous", [False, True])
def test_clean_loopback_symbols(cfg, phase_continuous):
    import dataclasses

    cfg = dataclasses.replace(cfg, phase_continuous=phase_continuous)
    rng = np.random.default_rng(7)
    syms = jnp.asarray(rng.integers(0, cfg.num_tones, 200))
    wave = modulate_symbols(cfg, syms)
    out, conf = demodulate_symbols(cfg, wave)
    assert np.array_equal(np.asarray(out), np.asarray(syms))
    assert float(jnp.min(conf)) > 0.9


def test_bfloat16_demod_still_exact_clean():
    rng = np.random.default_rng(8)
    syms = jnp.asarray(rng.integers(0, CFG.num_tones, 500))
    wave = modulate_symbols(CFG, syms)
    out, _ = demodulate_symbols(CFG, wave, compute_dtype=jnp.bfloat16)
    assert np.array_equal(np.asarray(out), np.asarray(syms))


def test_tone_energies_batched():
    rng = np.random.default_rng(9)
    syms = jnp.asarray(rng.integers(0, 4, (5, 20)))
    wave = modulate_symbols(CFG_SMALL, syms)
    e = tone_energies(CFG_SMALL, wave)
    assert e.shape == (5, 20, 4)


# --- sync -------------------------------------------------------------------

@pytest.mark.parametrize("method", ["fft", "direct", "matmul"])
@pytest.mark.parametrize("offset", [0, 1, 63, 500])
def test_preamble_located_at_any_offset(method, offset):
    template = preamble_waveform(CFG_SMALL)
    rng = np.random.default_rng(offset)
    capture = jnp.concatenate(
        [
            jnp.zeros(offset),
            template,
            jnp.asarray(rng.normal(0, 0.05, 700)),  # trailing noise
        ]
    ).astype(jnp.float32)
    res = locate_preamble(CFG_SMALL, capture, method=method)
    assert int(res.offset) == offset
    assert float(res.quality) > 0.95


def test_preamble_noisy_location():
    key = jax.random.PRNGKey(0)
    template = preamble_waveform(CFG)
    capture = jnp.concatenate([jnp.zeros(333), template, jnp.zeros(200)])
    noisy = awgn(key, capture, 5.0)
    res = locate_preamble(CFG, noisy)
    assert abs(int(res.offset) - 333) <= 1


def test_pure_noise_low_quality():
    noise = jax.random.normal(jax.random.PRNGKey(1), (8000,))
    res = locate_preamble(CFG_SMALL, noise)
    assert float(res.quality) < 0.5


@pytest.mark.parametrize("size,n", [(256, 768), (300, 1000), (128, 257), (36352, 44544)])
def test_aligned_gather_matches_take(size, n):
    """The coarse/fine MXU gather is bit-exact vs take_along_axis."""
    from anet.dsp.sync import aligned_gather

    rng = np.random.default_rng(size)
    x = jnp.asarray(rng.normal(size=(5, n)), jnp.float32)
    starts = jnp.asarray(rng.integers(0, n - size + 1, 5), jnp.int32)
    ref = jnp.take_along_axis(x, starts[:, None] + jnp.arange(size), axis=-1)
    got = aligned_gather(x, starts, size)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    # unbatched scalar start path
    got1 = aligned_gather(x[0], starts[0], size)
    assert np.array_equal(np.asarray(got1), np.asarray(ref[0]))
    # the TPU hot path's one-hot row-matmul mode is bit-identical to the
    # slab-DMA mode in bf16 (it moves the same rows, just via the MXU)
    xb = x.astype(jnp.bfloat16)
    g_dma = aligned_gather(xb, starts, size, jnp.bfloat16, mode="dma")
    g_oh = aligned_gather(xb, starts, size, jnp.bfloat16, mode="onehot")
    assert np.array_equal(np.asarray(g_oh), np.asarray(g_dma))


@pytest.mark.parametrize("n,k,block", [(777, 129, None), (2048, 512, 128),
                                       (300, 300, 512), (1000, 37, 256)])
def test_correlate_matmul_matches_direct(n, k, block):
    """The block-Toeplitz MXU formulation is exactly valid-mode xcorr."""
    from anet.dsp.sync import correlate_template

    rng = np.random.default_rng(n + k)
    x = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    t = jnp.asarray(rng.normal(size=k), jnp.float32)
    ref = correlate_template(x, t, method="direct")
    got = correlate_template(x, t, method="matmul", block=block)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


# --- framing ----------------------------------------------------------------

def test_frame_loopback_ip_proto_payload():
    """BASELINE config 1: one 64-byte ip.proto frame, byte-identical."""
    frame_bytes = encode_delimited(
        ToReceiver(audio_data=AudioData(b"\xa5" * 59)).encode()
    )
    assert len(frame_bytes) == 64
    payload = jnp.asarray(np.frombuffer(frame_bytes, np.uint8))
    res = loopback(CFG, payload, pad_before=1234, pad_after=77)
    assert bool(res.frame.ok)
    assert int(res.sync.offset) == 1234
    decoded = bytes(np.asarray(res.frame.payload))
    assert decoded == frame_bytes
    # and the payload still parses as wire protocol
    from anet.proto.framing import iter_delimited

    inner = next(iter_delimited(decoded))
    assert ToReceiver.decode(inner).audio_data.opus_encoded_frame == b"\xa5" * 59


def test_frame_detects_corruption():
    payload = random_payload(40)
    wave = np.array(transmit(CFG_SMALL, payload))
    # trash 3 symbols in the payload region
    sps = CFG_SMALL.samples_per_symbol
    start = (CFG_SMALL.preamble_symbols + 30) * sps
    wave[start : start + 3 * sps] = 0.0
    res = demodulate_frame(CFG_SMALL, jnp.asarray(wave), 40)
    assert not bool(res.payload_crc_ok)
    assert not bool(res.ok)


def test_frame_detects_wrong_magic():
    import dataclasses

    payload = random_payload(16)
    wave = transmit(CFG_SMALL, payload)
    # corrupt the first data symbols (magic word region)
    sps = CFG_SMALL.samples_per_symbol
    w = np.array(wave)
    w[CFG_SMALL.preamble_symbols * sps : (CFG_SMALL.preamble_symbols + 4) * sps] = 0.0
    res = demodulate_frame(CFG_SMALL, jnp.asarray(w), 16)
    assert not bool(res.magic_ok)


def test_frame_batched_vmap():
    payloads = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (6, 32), dtype=np.uint8)
    )
    waves = transmit(CFG_SMALL, payloads)  # leading batch axis, no vmap needed
    assert waves.shape == (6, frame_num_samples(CFG_SMALL, 32))
    res = demodulate_frame(CFG_SMALL, waves, 32)
    assert np.all(np.asarray(res.ok))
    assert np.array_equal(np.asarray(res.payload), np.asarray(payloads))


# --- channel ----------------------------------------------------------------

def test_awgn_hits_target_snr():
    key = jax.random.PRNGKey(2)
    x = jnp.sin(jnp.linspace(0, 1000, 48_000))
    y = awgn(key, x, 10.0)
    noise = y - x
    snr = 10 * np.log10(float(jnp.mean(x * x) / jnp.mean(noise * noise)))
    assert abs(snr - 10.0) < 0.3


def test_dropout_zeroes_blocks():
    key = jax.random.PRNGKey(3)
    x = jnp.ones((4, 4096))
    y = dropout(key, x, 0.5, 256)
    frac = float(jnp.mean(y))
    assert 0.2 < frac < 0.8
    # zeros come in whole blocks
    z = np.asarray(y[0]).reshape(-1, 256)
    assert all(row.all() or not row.any() for row in z)


def test_multipath_is_causal_fir():
    x = jnp.zeros(64).at[10].set(1.0)
    y = np.asarray(multipath(x, jnp.asarray([1.0, 0.0, 0.5])))
    assert y[10] == pytest.approx(1.0)
    assert y[12] == pytest.approx(0.5)
    assert np.all(y[:10] == 0)


def test_noisy_frame_loopback_10db():
    """Operating point from BASELINE: frames decode clean at 10 dB SNR."""
    payload = random_payload(64, seed=5)
    wave = transmit(CFG, payload)
    capture = jnp.concatenate([jnp.zeros(101), wave, jnp.zeros(57)])
    chan = ChannelConfig(snr_db=10.0)
    noisy = apply_channel(jax.random.PRNGKey(4), capture, chan)
    res = receive_frame(CFG, noisy, 64)
    assert abs(int(res.sync.offset) - 101) <= 1
    assert bool(res.frame.ok)
    assert np.array_equal(np.asarray(res.frame.payload), np.asarray(payload))
    assert 0.0 < float(res.frame.snr_db) < 40.0


def test_multipath_frame_loopback():
    payload = random_payload(48, seed=6)
    wave = transmit(CFG, payload)
    capture = jnp.concatenate([jnp.zeros(64), wave, jnp.zeros(64)])
    chan = ChannelConfig(snr_db=15.0, multipath_taps=(1.0, 0.0, 0.0, 0.0, 0.25))
    out = apply_channel(jax.random.PRNGKey(5), capture, chan)
    res = receive_frame(CFG, out, 48)
    assert bool(res.frame.ok)


def test_channel_config_json_roundtrip():
    chan = ChannelConfig(snr_db=7.5, multipath_taps=(1.0, 0.3), drop_rate=0.01)
    assert ChannelConfig.from_json(chan.to_json()) == chan


def test_blockwise_quality_bounds_and_detection():
    """blockwise_match_quality stays within the documented over-count-only
    bound of the exact normalized quality, and agrees on the peak."""
    from anet.dsp.sync import (
        blockwise_match_quality,
        correlate_template,
        normalized_match_quality,
        preamble_waveform,
        sliding_window_energy,
    )

    tmpl = preamble_waveform(CFG_SMALL)
    k = tmpl.shape[-1]
    rng = np.random.default_rng(17)
    seg = np.asarray(rng.normal(0, 0.3, (3, 2048 + k - 1)), np.float32)
    seg[1, 400 : 400 + k] += np.asarray(tmpl)  # a real preamble in stream 1
    seg = jnp.asarray(seg)
    corr = correlate_template(seg, tmpl, method="direct")
    t_e = jnp.sum(tmpl * tmpl)
    exact = np.asarray(
        normalized_match_quality(corr, sliding_window_energy(seg, k), t_e)
    )
    coarse = np.asarray(blockwise_match_quality(seg, corr, k, t_e))
    # energy only over-counts -> coarse quality <= exact (tiny fp slack),
    # and by at most the documented (kb*128 - k)/k energy factor
    assert (coarse <= exact * 1.001).all()
    # the proportional lower bound assumes locally stationary energy, so
    # assert it only where a real (stationary) preamble sits; pure-noise
    # lags can legitimately over-count more than their sample share
    kb = -(-k // 128) + 1
    floor = 1.0 / np.sqrt(1.0 + (kb * 128 - k) / k)
    peak = exact > 0.5
    assert peak.any()
    assert (coarse[peak] >= exact[peak] * floor * 0.99).all()
    # same argmax at the injected preamble
    assert int(np.argmax(coarse[1])) == int(np.argmax(exact[1])) == 400
    assert coarse[1].max() > 0.8  # comfortably above the 0.45 threshold
