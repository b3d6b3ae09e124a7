"""OFDM modem family tests: synthesis, equalization, frame-stack sharing."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anet.channel import ChannelConfig, apply_channel, awgn
from anet.dsp import ofdm
from anet.dsp.ofdm import OfdmConfig

CFG = OfdmConfig()


def payload(n=256, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(0, 256, n, np.uint8))


def test_config_validation_and_json():
    with pytest.raises(ValueError, match="power of two"):
        OfdmConfig(n_fft=200)
    with pytest.raises(ValueError, match="cp_len"):
        OfdmConfig(cp_len=0)
    with pytest.raises(ValueError, match="Nyquist"):
        OfdmConfig(first_carrier=64, n_carriers=96)
    assert OfdmConfig.from_json(CFG.to_json()) == CFG
    assert CFG.bit_rate_bps == pytest.approx(28_800)


def test_qpsk_gray_map():
    bits = jnp.asarray([0, 0, 0, 1, 1, 0, 1, 1], jnp.uint8)
    z = np.asarray(ofdm.bits_to_qpsk(bits)) * np.sqrt(2)
    np.testing.assert_allclose(z, [1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], atol=1e-6)


def test_waveform_is_real_audio_band():
    wave = np.asarray(ofdm.transmit(CFG, payload(64)))
    assert wave.dtype == np.float32
    rms = float(np.sqrt(np.mean(wave**2)))
    assert 0.05 < rms < 0.3  # sane loudness for the default amplitude
    # spectral content confined to the carrier band
    spec = np.abs(np.fft.rfft(wave))
    freqs = np.fft.rfftfreq(len(wave), 1 / CFG.sample_rate_hz)
    in_band = spec[(freqs >= 2_900) & (freqs <= 21_000)].sum()
    out_band = spec[(freqs < 2_500) | (freqs > 21_500)].sum()
    # rect-windowed OFDM has sinc sidelobes; ~13 dB containment is expected
    assert in_band > 10 * out_band


def test_clean_aligned_roundtrip():
    p = payload()
    res = ofdm.demodulate_frame(CFG, ofdm.transmit(CFG, p), 256)
    assert bool(res.ok)
    assert np.array_equal(np.asarray(res.payload), np.asarray(p))
    assert float(res.snr_db) > 40


def test_receive_with_offset_and_noise():
    p = payload(128, seed=1)
    cap = jnp.concatenate([jnp.zeros(1234), ofdm.transmit(CFG, p), jnp.zeros(400)])
    noisy = awgn(jax.random.PRNGKey(3), cap, 12.0)
    r = ofdm.receive_frame(CFG, noisy, 128)
    assert int(r.offset) == 1234
    assert bool(r.frame.ok)
    assert np.array_equal(np.asarray(r.frame.payload), np.asarray(p))


def test_equalizer_handles_echo_inside_cp():
    """Echoes within the cyclic prefix are absorbed by the one-tap
    equalizer — OFDM's reason to exist on reverberant channels. A strong
    echo notches some carriers deeply, so the realistic configuration is
    coded OFDM (errors concentrate in the faded carriers and the
    interleaved code mops them up); a mild echo decodes even uncoded."""
    p = payload(192, seed=2)
    # strong echo (-3 dB at 0.85 ms): coded OFDM required and sufficient
    cfg_coded = dataclasses.replace(CFG, fec="conv", fec_interleave=32)
    cap = jnp.concatenate(
        [jnp.zeros(300), ofdm.transmit(cfg_coded, p), jnp.zeros(300)]
    )
    taps = tuple([1.0] + [0.0] * 40 + [0.7])
    dirty = apply_channel(
        jax.random.PRNGKey(4), cap, ChannelConfig(snr_db=18.0, multipath_taps=taps)
    )
    r = ofdm.receive_frame(cfg_coded, dirty, 192)
    assert bool(r.frame.ok)
    assert np.array_equal(np.asarray(r.frame.payload), np.asarray(p))
    # mild echo (-9 dB): uncoded QPSK survives
    cap_u = jnp.concatenate([jnp.zeros(300), ofdm.transmit(CFG, p), jnp.zeros(300)])
    mild = apply_channel(
        jax.random.PRNGKey(4),
        cap_u,
        ChannelConfig(snr_db=20.0, multipath_taps=tuple([1.0] + [0.0] * 40 + [0.35])),
    )
    r2 = ofdm.receive_frame(CFG, mild, 192)
    assert bool(r2.frame.ok)


def test_ofdm_shares_fec_stack():
    """fec='conv' + interleaver work unchanged through the shared parser."""
    cfg = dataclasses.replace(CFG, fec="conv", fec_interleave=32)
    p = payload(96, seed=3)
    cap = jnp.concatenate([jnp.zeros(200), ofdm.transmit(cfg, p), jnp.zeros(200)])
    noisy = awgn(jax.random.PRNGKey(5), cap, 6.0)  # well below uncoded comfort
    r = ofdm.receive_frame(cfg, noisy, 96)
    assert bool(r.frame.ok)
    assert np.array_equal(np.asarray(r.frame.payload), np.asarray(p))
    # uncoded at the same SNR fails
    r_raw = ofdm.receive_frame(CFG, awgn(jax.random.PRNGKey(5),
        jnp.concatenate([jnp.zeros(200), ofdm.transmit(CFG, p), jnp.zeros(200)]), 6.0), 96)
    assert not bool(r_raw.frame.ok)


def test_batched_streams():
    p = jnp.asarray(np.random.default_rng(6).integers(0, 256, (5, 64), np.uint8))
    waves = ofdm.transmit(CFG, p)
    assert waves.shape[0] == 5
    res = ofdm.demodulate_frame(CFG, waves, 64)
    assert np.all(np.asarray(res.ok))
    assert np.array_equal(np.asarray(res.payload), np.asarray(p))


def test_corruption_detected():
    p = payload(64, seed=7)
    w = np.array(ofdm.transmit(CFG, p))
    w[CFG.preamble_samples + 2 * CFG.symbol_samples :][:500] = 0.0
    res = ofdm.demodulate_frame(CFG, jnp.asarray(w), 64)
    assert not bool(res.ok)


def test_ofdm_streaming_receiver():
    """The chunked-scan streaming receiver is modulation-agnostic: OFDM
    frames at arbitrary positions in a long capture are found and decoded."""
    from anet.stream import receive_stream

    rng = np.random.default_rng(0)
    P = 200
    payloads = [rng.integers(0, 256, P, dtype=np.uint8) for _ in range(3)]
    waves = [np.asarray(ofdm.transmit(CFG, jnp.asarray(p))) for p in payloads]
    parts, pos, starts = [], 0, []
    for g, w in zip((900, 1400, 777), waves):
        parts.append(np.zeros(g, np.float32))
        pos += g
        starts.append(pos)
        parts.append(w)
        pos += len(w)
    cap = np.concatenate(parts + [np.zeros(3000, np.float32)])
    chunk = 512
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    noisy = awgn(jax.random.PRNGKey(1), jnp.asarray(cap), 14.0)
    res = receive_stream(CFG, noisy, chunk, P)
    assert int(res.carry.frames_ok) == 3
    det = np.asarray(res.steps.detected)
    idx = np.nonzero(det)[0]
    assert np.asarray(res.steps.frame_start)[idx].tolist() == starts
    for j, i in enumerate(idx):
        assert np.array_equal(np.asarray(res.steps.frame.payload)[i], payloads[j])


def test_ofdm_time_sharded_long_capture():
    """Context-parallel long-capture receive works over OFDM frames too."""
    from anet.parallel import make_mesh, sharded_receive_long_capture

    mesh = make_mesh()
    rng = np.random.default_rng(1)
    P = 64
    chunk = 256
    payloads = [rng.integers(0, 256, P, dtype=np.uint8) for _ in range(3)]
    waves = [np.asarray(ofdm.transmit(CFG, jnp.asarray(p))) for p in payloads]
    parts = []
    for g, w in zip((4000, 5100, 4700), waves):
        parts += [np.zeros(g, np.float32), w]
    cap = np.concatenate(parts + [np.zeros(4000, np.float32)])
    blk = 8 * chunk
    cap = np.concatenate([cap, np.zeros((-len(cap)) % blk, np.float32)])
    noisy = awgn(jax.random.PRNGKey(2), jnp.asarray(cap), 16.0)
    res = sharded_receive_long_capture(CFG, mesh, noisy, chunk, P)
    assert int(res.frames_ok) == 3


def test_qam16_mapping_gray_and_power():
    bits = jnp.asarray(
        [0,0,0,0, 0,1,0,1, 1,1,1,1, 1,0,1,0], jnp.uint8
    )
    z = np.asarray(ofdm.bits_to_qam16(bits)) * np.sqrt(10)
    np.testing.assert_allclose(z, [-3-3j, -1-1j, 1+1j, 3+3j], atol=1e-5)
    # unit average power over the full constellation
    all_bits = jnp.asarray(
        [[(v >> k) & 1 for k in (3, 2, 1, 0)] for v in range(16)], jnp.uint8
    ).reshape(-1)
    pts = np.asarray(ofdm.bits_to_qam16(all_bits))
    assert np.mean(np.abs(pts) ** 2) == pytest.approx(1.0, rel=1e-6)


def test_qam16_roundtrip_and_waterfall():
    cfg = dataclasses.replace(CFG, bits_per_carrier=4)
    assert cfg.bit_rate_bps == pytest.approx(57_600)
    p = payload(192, seed=9)
    w = ofdm.transmit(cfg, p)
    r = ofdm.demodulate_frame(cfg, w, 192)
    assert bool(r.ok)
    assert np.array_equal(np.asarray(r.payload), np.asarray(p))
    # 22 dB comfortable, 8 dB hopeless — the higher-order waterfall
    cap = jnp.concatenate([jnp.zeros(400), w, jnp.zeros(300)])
    good = ofdm.receive_frame(cfg, awgn(jax.random.PRNGKey(1), cap, 22.0), 192)
    bad = ofdm.receive_frame(cfg, awgn(jax.random.PRNGKey(1), cap, 8.0), 192)
    assert bool(good.frame.ok) and not bool(bad.frame.ok)


def test_qam16_soft_fec_composition():
    """ofdm-turbo: coded 16-QAM decodes where uncoded 16-QAM fails."""
    from anet.models import get_model

    cfg = get_model("ofdm-turbo").config
    assert cfg.bits_per_carrier == 4 and cfg.fec == "conv"
    p = payload(128, seed=10)
    w = ofdm.transmit(cfg, p)
    cap = jnp.concatenate([jnp.zeros(300), w, jnp.zeros(300)])
    r = ofdm.receive_frame(cfg, awgn(jax.random.PRNGKey(2), cap, 14.0), 128)
    assert bool(r.frame.ok)
    assert np.array_equal(np.asarray(r.frame.payload), np.asarray(p))
    uncoded = dataclasses.replace(cfg, fec="none", fec_interleave=0)
    wu = ofdm.transmit(uncoded, p)
    capu = jnp.concatenate([jnp.zeros(300), wu, jnp.zeros(300)])
    ru = ofdm.receive_frame(uncoded, awgn(jax.random.PRNGKey(2), capu, 14.0), 128)
    assert not bool(ru.frame.ok)


def test_qam64_constellation_gray_mapping():
    """All 64 points: exact Gray-PAM8 amplitudes, unit average power, and
    adjacent amplitude levels differ in exactly one bit."""
    from anet.dsp.ofdm import _QAM64_SCALE, bits_to_qam64

    codes = np.array(
        [[(v >> (5 - k)) & 1 for k in range(6)] for v in range(64)], np.uint8
    )
    pts = np.asarray(bits_to_qam64(jnp.asarray(codes.reshape(-1))))
    assert pts.shape == (64,)
    levels = np.array([-7, -5, -3, -1, 1, 3, 5, 7]) * _QAM64_SCALE
    for axis in (pts.real, pts.imag):
        assert np.allclose(sorted(set(np.round(axis, 6))), np.round(levels, 6))
    np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0, rtol=1e-6)
    # Gray property per axis: sort codes by I amplitude, neighbors differ 1 bit
    order = np.argsort(pts.real[::8])  # Q fixed, I varies with bits 0-2
    i_bits = codes[::8][order][:, :3]
    for a, b in zip(i_bits, i_bits[1:]):
        assert int(np.sum(a ^ b)) == 1


def test_qam64_llr_hard_decisions_match_constellation():
    """Clean equalized points decide back to the bits that produced them."""
    from anet.dsp.ofdm import _pam8_llrs, bits_to_qam64

    codes = np.array(
        [[(v >> (5 - k)) & 1 for k in range(6)] for v in range(64)], np.uint8
    )
    pts = np.asarray(bits_to_qam64(jnp.asarray(codes.reshape(-1))))
    w = jnp.ones(64)
    li = _pam8_llrs(jnp.asarray(pts.real), w)
    lq = _pam8_llrs(jnp.asarray(pts.imag), w)
    hard = np.stack([np.asarray(x) > 0 for x in (*li, *lq)], axis=-1).astype(np.uint8)
    assert np.array_equal(hard, codes)


# --- sample-clock drift (speaker DAC vs mic ADC crystal offset) --------------


def resample_ppm(x, ppm):
    """Band-limited (sinc-exact) resample modeling a receiver whose ADC
    clock differs by ``ppm`` parts per million: evaluates the DFT
    interpolant of the waveform at sample times t*(1 + ppm*1e-6). Linear
    interpolation is NOT a faithful model — its fractional-offset error
    acts like phase noise an order of magnitude above the drift being
    tested — while an ADC samples the continuous waveform exactly."""
    x = np.asarray(x, np.float64)
    n = len(x)
    X = np.fft.rfft(x)
    coef = X.copy()
    coef[1:-1] *= 2
    t = np.arange(int(n / (1 + ppm * 1e-6))) * (1 + ppm * 1e-6)
    out = np.empty(len(t))
    freqs = np.arange(len(X))
    for i in range(0, len(t), 2048):
        tt = t[i : i + 2048]
        ph = np.exp(2j * np.pi * np.outer(tt, freqs) / n)
        out[i : i + 2048] = (ph @ coef).real / n
    return out.astype(np.float32)


@pytest.mark.parametrize(
    "cfg,snr_db",
    [
        (CFG, 16.0),
        (dataclasses.replace(CFG, bits_per_carrier=4), 24.0),
        (
            dataclasses.replace(
                CFG, bits_per_carrier=6, fec="conv", fec_interleave=32
            ),
            24.0,
        ),
    ],
    ids=["qpsk", "qam16", "qam64-coded"],
)
def test_drift_decode_within_200ppm(cfg, snr_db):
    """Every constellation decodes at +-200 ppm clock offset (typical
    crystal tolerance is +-100 ppm per end): the preamble-seeded
    phase-slope tracker (clock_tracking) plus the early-FFT-window timing
    bias absorb both the accumulated per-symbol rotation and the window
    slip. Without tracking, the top carriers rotate ~120 degrees by the
    12th symbol at 200 ppm — far past any decision boundary."""
    p = payload(256, seed=21)
    w = np.asarray(ofdm.transmit(cfg, p))
    for ppm in (200, -200):
        x = resample_ppm(w, ppm)
        cap = jnp.concatenate([jnp.zeros(500), jnp.asarray(x), jnp.zeros(800)])
        noisy = awgn(jax.random.PRNGKey(1), cap, snr_db)
        r = ofdm.receive_frame(cfg, noisy, 256)
        assert bool(r.frame.ok), f"{ppm:+d} ppm failed"
        assert np.array_equal(np.asarray(r.frame.payload), np.asarray(p))


def test_drift_qpsk_tracks_to_400ppm():
    p = payload(256, seed=22)
    w = np.asarray(ofdm.transmit(CFG, p))
    for ppm in (400, -400):
        x = resample_ppm(w, ppm)
        cap = jnp.concatenate([jnp.zeros(300), jnp.asarray(x), jnp.zeros(600)])
        noisy = awgn(jax.random.PRNGKey(2), cap, 14.0)
        r = ofdm.receive_frame(CFG, noisy, 256)
        assert bool(r.frame.ok), f"{ppm:+d} ppm failed"


def test_drift_untracked_fails():
    """Sanity: the drift actually kills an untracked receiver (otherwise
    the tracking tests prove nothing)."""
    cfg = dataclasses.replace(CFG, clock_tracking=False)
    p = payload(256, seed=23)
    x = resample_ppm(np.asarray(ofdm.transmit(cfg, p)), 300)
    cap = jnp.concatenate([jnp.zeros(500), jnp.asarray(x), jnp.zeros(800)])
    r = ofdm.receive_frame(cfg, awgn(jax.random.PRNGKey(3), cap, 16.0), 256)
    assert not bool(r.frame.ok)


def test_tracking_never_corrupts_clean_clock_low_snr():
    """REGRESSION (round 5): at low SNR the preamble seed has heavy
    unwrapped error tails (0.002-0.008 rad at 6 dB) that the seed's wrap
    gate cannot see, and the decision-directed fit LOCKS onto the poison
    (final c == slope0 on every corrupted frame) — ofdm-coded silently
    lost ~14% of clean-clock frames at 4-8 dB (FER 0 with tracking off)
    for several rounds while the BER table showed the pre-tracking
    numbers. The identity gate in _phase_track (tracked vs unrotated
    decision coherence) must make tracking a strict no-op-or-better:
    every frame that decodes with tracking OFF must decode with it ON."""
    from anet.channel import ChannelConfig, apply_channel
    from anet.dsp import family
    from anet.models import get_model

    cfg = get_model("ofdm-coded").config
    cfg_off = dataclasses.replace(cfg, clock_tracking=False)
    rng = np.random.default_rng(3)
    b, pay = 48, 64
    pays = jnp.asarray(rng.integers(0, 256, (b, pay), dtype=np.uint8))
    w = jax.jit(family.transmit_fn(cfg))(pays)
    for snr in (4.0, 6.0, 8.0):
        dirty = apply_channel(
            jax.random.PRNGKey(7), w, ChannelConfig(), snr_db=jnp.full((), snr)
        )
        ok_off = np.asarray(ofdm.demodulate_frame(cfg_off, dirty, pay).ok)
        ok_on = np.asarray(ofdm.demodulate_frame(cfg, dirty, pay).ok)
        assert (ok_on | ~ok_off).all(), (
            f"tracking corrupted {int((~ok_on & ok_off).sum())} clean-clock "
            f"frames at {snr} dB"
        )
        assert ok_off.all(), f"setup: untracked should be clean at {snr} dB"


def test_drift_estimate_ppm():
    """The Schmidl-Cox-style preamble estimator reads the clock offset
    from one aligned frame to within ~15%."""
    p = payload(128, seed=24)
    w = np.asarray(ofdm.transmit(CFG, p))
    for ppm in (0, 150, -150, 350):
        est = float(ofdm.estimate_drift_ppm(CFG, jnp.asarray(resample_ppm(w, ppm))))
        assert abs(est - ppm) < max(30.0, 0.15 * abs(ppm)), (ppm, est)


def test_drift_zero_cost_when_clean():
    """Tracking must not burn SNR margin when there is no drift: the
    joint (symbol x carrier) least-squares fit has an order of magnitude
    less noise than one preamble's estimate."""
    cfg16 = dataclasses.replace(CFG, bits_per_carrier=4)
    cfg16_off = dataclasses.replace(cfg16, clock_tracking=False)
    p = payload(256, seed=25)
    cap = jnp.concatenate([jnp.zeros(400), ofdm.transmit(cfg16, p), jnp.zeros(400)])
    noisy = awgn(jax.random.PRNGKey(4), cap, 24.0)
    on = float(ofdm.receive_frame(cfg16, noisy, 256).frame.snr_db)
    off = float(ofdm.receive_frame(cfg16_off, noisy, 256).frame.snr_db)
    assert on > off - 1.0, (on, off)


def test_drift_multiframe_stream():
    """Long-capture streaming under +-200 ppm drift: each frame is
    re-acquired by its own preamble correlation (bounding inter-frame
    timing error) and in-frame rotation is tracked, so every frame in a
    multi-frame capture decodes."""
    from anet.stream import receive_stream

    rng = np.random.default_rng(26)
    P = 200
    payloads = [rng.integers(0, 256, P, dtype=np.uint8) for _ in range(3)]
    for ppm in (200, -200):
        parts = []
        for g, p in zip((900, 1400, 777), payloads):
            parts.append(np.zeros(g, np.float32))
            parts.append(resample_ppm(np.asarray(ofdm.transmit(CFG, jnp.asarray(p))), ppm))
        cap = np.concatenate(parts + [np.zeros(3000, np.float32)])
        chunk = 512
        cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
        noisy = awgn(jax.random.PRNGKey(5), jnp.asarray(cap), 16.0)
        res = receive_stream(CFG, noisy, chunk, P)
        assert int(res.carry.frames_ok) == 3, f"{ppm:+d} ppm"
        det = np.nonzero(np.asarray(res.steps.detected))[0]
        for j, i in enumerate(det):
            assert np.array_equal(np.asarray(res.steps.frame.payload)[i], payloads[j])


def test_qam64_coded_loopback_at_operating_snr():
    """ofdm-max decodes cleanly at its advertised 18 dB threshold + margin."""
    from anet.channel import awgn
    from anet.models import get_model

    cfg = get_model("ofdm-max").config
    assert cfg.bit_rate_bps == pytest.approx(86_400)
    payload = jnp.asarray(
        np.random.default_rng(8).integers(0, 256, 150, np.uint8)
    )
    cap = jnp.concatenate([jnp.zeros(250), ofdm.transmit(cfg, payload), jnp.zeros(250)])
    for seed in range(3):
        noisy = awgn(jax.random.PRNGKey(seed), cap, 20.0)
        r = ofdm.receive_frame(cfg, noisy, 150)
        assert bool(r.frame.ok), f"seed {seed} failed at 20 dB"
        assert np.array_equal(np.asarray(r.frame.payload), np.asarray(payload))


def test_dft_matmul_matches_fft_golden():
    """The sparse-carrier DFT matmuls (synthesis with folded CP, analysis
    with folded deramp) are numerically the irfft/rfft formulations they
    replaced — checked against numpy's FFTs directly."""
    rng = np.random.default_rng(11)
    S, C, N = 3, CFG.n_carriers, CFG.n_fft
    carriers = jnp.asarray(
        (rng.normal(size=(S, C)) + 1j * rng.normal(size=(S, C))) / np.sqrt(2),
        jnp.complex64,
    )
    # synthesis vs numpy irfft + explicit CP prepend
    wave = ofdm._symbols_to_waveform(CFG, carriers)
    spec = np.zeros((S, N // 2 + 1), np.complex128)
    spec[:, CFG.first_carrier : CFG.first_carrier + C] = np.asarray(carriers)
    time = np.fft.irfft(spec, n=N, axis=-1)
    with_cp = np.concatenate([time[:, -CFG.cp_len :], time], axis=-1)
    scale = (CFG.amplitude / 4.0) * N / np.sqrt(2.0 * C)
    np.testing.assert_allclose(
        np.asarray(wave), (with_cp * scale).reshape(-1), rtol=2e-4, atol=2e-5
    )
    # analysis vs numpy rfft + slice + deramp
    samples = jnp.asarray(rng.normal(size=(S * CFG.symbol_samples,)), jnp.float32)
    got = ofdm._extract_carriers(CFG, samples, S)
    bias = ofdm._timing_bias(CFG)
    sym = np.asarray(samples).reshape(S, CFG.symbol_samples)
    no_cp = sym[:, CFG.cp_len - bias : CFG.symbol_samples - bias]
    ref = np.fft.rfft(no_cp, n=N, axis=-1)[
        :, CFG.first_carrier : CFG.first_carrier + C
    ]
    m = CFG.first_carrier + np.arange(C)
    ref = ref * np.exp(2j * np.pi * m * bias / N)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("model", ["ofdm-fast", "ofdm-turbo", "ofdm-max"])
def test_demodulate_frame_tm_matches_batch_major(model):
    """The time-major OFDM demodulator matches the batch-major one
    byte-exactly (payloads/ok) and numerically (snr), across QPSK/16-QAM/
    64-QAM and the coded stack, with clock tracking on."""
    from anet.models import get_model

    cfg = get_model(model).config
    rng = np.random.default_rng(13)
    p = jnp.asarray(rng.integers(0, 256, (4, 96), np.uint8))
    snr = {"ofdm-fast": 15.0, "ofdm-turbo": 20.0, "ofdm-max": 27.0}[model]
    noisy = awgn(jax.random.PRNGKey(7), ofdm.transmit(cfg, p), snr)
    r_bm = ofdm.demodulate_frame(cfg, noisy, 96)
    r_tm = ofdm.demodulate_frame_tm(cfg, noisy.T, 96)
    assert np.array_equal(np.asarray(r_tm.payload), np.asarray(r_bm.payload))
    assert np.array_equal(np.asarray(r_tm.ok), np.asarray(r_bm.ok))
    assert np.asarray(r_bm.ok).all()
    np.testing.assert_allclose(
        np.asarray(r_tm.snr_db), np.asarray(r_bm.snr_db), rtol=1e-3
    )


@pytest.mark.parametrize(
    "cfg,snr_db",
    [
        (CFG, 16.0),
        (dataclasses.replace(CFG, clock_tracking=False), 16.0),
        (dataclasses.replace(CFG, bits_per_carrier=4), 24.0),
        (
            dataclasses.replace(
                CFG, bits_per_carrier=6, fec="conv", fec_interleave=32
            ),
            26.0,
        ),
    ],
    ids=["qpsk", "qpsk-untracked", "qam16", "qam64-coded"],
)
def test_ofdm_fused_track_decide_matches_golden(cfg, snr_db, monkeypatch):
    """The fused equalize+track+decide kernel (interpret mode) reproduces
    the jnp _equalized_bits path through demodulate_frame: identical
    payloads/ok and matching metrics, across constellations, coded and
    uncoded, with and without tracking, under real clock drift."""
    import functools

    import anet.kernels as K
    from anet.kernels import ofdm_track_decide_fused as real_kernel

    rng = np.random.default_rng(31)
    p = jnp.asarray(rng.integers(0, 256, (3, 128), np.uint8))
    w = np.asarray(ofdm.transmit(cfg, p))
    t = cfg.frame_num_samples(128)
    ppms = (150, 0, -150) if cfg.clock_tracking else (0, 0, 0)
    drifted = np.stack(
        [
            np.pad(r, (0, max(0, t - r.shape[-1])))[:t]
            for r in (resample_ppm(x, ppm) for x, ppm in zip(w, ppms))
        ]
    )
    aligned = jnp.asarray(drifted)
    noisy = awgn(jax.random.PRNGKey(9), aligned, snr_db)

    ref = ofdm.demodulate_frame(cfg, noisy, 128)

    monkeypatch.setattr(ofdm, "_use_fused_track", lambda: True)
    monkeypatch.setattr(
        K, "ofdm_track_decide_fused", functools.partial(real_kernel, interpret=True)
    )
    got = ofdm.demodulate_frame(cfg, noisy, 128)

    assert np.asarray(ref.ok).all()
    np.testing.assert_array_equal(np.asarray(got.payload), np.asarray(ref.payload))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_allclose(
        np.asarray(got.confidence), np.asarray(ref.confidence), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.snr_db), np.asarray(ref.snr_db), rtol=1e-3, atol=1e-3
    )


def test_ofdm_fused_dynamic_matches_golden(monkeypatch):
    """The fused path's EVM masking (overhead-span-only metrics) matches
    demodulate_frame_dynamic's golden z_eq slice."""
    import functools

    import anet.kernels as K
    from anet.kernels import ofdm_track_decide_fused as real_kernel

    rng = np.random.default_rng(33)
    p = jnp.asarray(rng.integers(0, 256, (2, 64), np.uint8))
    w = ofdm.transmit(CFG, p)
    t_max = CFG.frame_num_samples(200)
    cap = jnp.zeros((2, t_max), jnp.float32).at[:, : w.shape[-1]].set(w)
    noisy = awgn(jax.random.PRNGKey(11), cap, 18.0)

    ref = ofdm.demodulate_frame_dynamic(CFG, noisy, 200)

    monkeypatch.setattr(ofdm, "_use_fused_track", lambda: True)
    monkeypatch.setattr(
        K, "ofdm_track_decide_fused", functools.partial(real_kernel, interpret=True)
    )
    got = ofdm.demodulate_frame_dynamic(CFG, noisy, 200)

    assert np.asarray(ref.ok).all()
    np.testing.assert_array_equal(np.asarray(got.payload), np.asarray(ref.payload))
    np.testing.assert_array_equal(
        np.asarray(got.payload_len), np.asarray(ref.payload_len)
    )
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_allclose(
        np.asarray(got.confidence), np.asarray(ref.confidence), rtol=1e-4
    )
