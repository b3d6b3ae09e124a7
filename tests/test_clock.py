"""Symbol-clock recovery tests (BASELINE config 2: single stream with clock
recovery) + the 44.1 kHz loopback of BASELINE config 1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anet.channel import awgn, sample_rate_drift
from anet.dsp import ModemConfig
from anet.dsp.clock import demodulate_symbols_tracked, estimate_drift_ppm
from anet.dsp.mod import modulate_symbols
from anet.dsp.pipeline import receive_frame, receive_frame_tracked, transmit

CFG = ModemConfig(symbol_rate_hz=1500, num_tones=4, preamble_symbols=16)


def _drifted_capture(payload_len=256, ppm=0.0, snr_db=15.0, seed=0, cfg=CFG):
    payload = jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, payload_len, np.uint8)
    )
    cap = jnp.concatenate(
        [jnp.zeros(300), transmit(cfg, payload), jnp.zeros(2500)]
    )
    cap = sample_rate_drift(cap, ppm)
    cap = awgn(jax.random.PRNGKey(seed), cap, snr_db)
    return payload, cap


def test_tracked_demod_matches_block_demod_clean():
    rng = np.random.default_rng(1)
    syms = jnp.asarray(rng.integers(0, CFG.num_tones, 120))
    wave = modulate_symbols(CFG, syms)
    padded = jnp.concatenate([wave, jnp.zeros(64)])
    res = demodulate_symbols_tracked(CFG, padded, 120, start_pos=0.0)
    assert np.array_equal(np.asarray(res.symbols), np.asarray(syms))
    # short window -> coarse estimate; just confirm there's no runaway slope
    assert abs(float(estimate_drift_ppm(CFG, res))) < 250


@pytest.mark.parametrize("ppm", [400.0, -400.0, 1000.0])
def test_tracker_survives_drift_that_breaks_block_demod(ppm):
    payload, cap = _drifted_capture(payload_len=384, ppm=ppm)
    plain = receive_frame(CFG, cap, 384)
    tracked = receive_frame_tracked(CFG, cap, 384)
    assert not bool(plain.frame.ok), "block demod unexpectedly survived drift"
    assert bool(tracked.frame.ok)
    assert np.array_equal(np.asarray(tracked.frame.payload), np.asarray(payload))
    # drift estimate within 15% + sign flipped (RX-fast clock = negative slope)
    est = float(tracked.drift_ppm)
    assert est * ppm < 0
    assert abs(abs(est) - abs(ppm)) < 0.15 * abs(ppm) + 30


def test_tracked_zero_drift_estimate_near_zero():
    _, cap = _drifted_capture(ppm=0.0)
    tracked = receive_frame_tracked(CFG, cap, 256)
    assert bool(tracked.frame.ok)
    assert abs(float(tracked.drift_ppm)) < 50
    assert float(tracked.timing_error_rms) < 0.1


def test_tracked_batched_streams():
    payloads, caps = [], []
    for seed, ppm in enumerate((0.0, 500.0, -500.0)):
        p, c = _drifted_capture(payload_len=128, ppm=ppm, seed=seed)
        payloads.append(np.asarray(p))
        caps.append(np.asarray(c))
    n = min(c.shape[-1] for c in caps)
    batch = jnp.asarray(np.stack([c[:n] for c in caps]))
    res = receive_frame_tracked(CFG, batch, 128)
    assert np.all(np.asarray(res.frame.ok))
    assert np.array_equal(np.asarray(res.frame.payload), np.stack(payloads))


def test_baseline_config1_loopback_2fsk_44k1():
    """BASELINE config 1 verbatim: one 64-byte ip.proto frame at 44.1 kHz,
    binary FSK, pure jnp on CPU, byte-identical."""
    from anet.proto import AudioData, ToReceiver, encode_delimited
    from anet.proto.framing import iter_delimited

    cfg = ModemConfig(
        sample_rate_hz=44_100,
        symbol_rate_hz=441,
        num_tones=2,
        base_freq_hz=3_000.0,
        tone_spacing_multiple=2,
        preamble_symbols=24,
    )
    frame_bytes = encode_delimited(
        ToReceiver(audio_data=AudioData(b"\x42" * 59)).encode()
    )
    assert len(frame_bytes) == 64
    payload = jnp.asarray(np.frombuffer(frame_bytes, np.uint8))
    wave = transmit(cfg, payload)
    cap = jnp.concatenate([jnp.zeros(1000), wave, jnp.zeros(500)])
    res = receive_frame(cfg, cap, 64)
    assert bool(res.frame.ok)
    decoded = bytes(np.asarray(res.frame.payload))
    assert decoded == frame_bytes
    inner = next(iter_delimited(decoded))
    assert ToReceiver.decode(inner).audio_data.opus_encoded_frame == b"\x42" * 59


def test_drift_channel_impairment_properties():
    x = jnp.sin(jnp.linspace(0, 100, 48_000))
    y = sample_rate_drift(x, 100.0)
    assert y.shape == x.shape
    # zero drift is identity
    np.testing.assert_allclose(
        np.asarray(sample_rate_drift(x, 0.0)), np.asarray(x), atol=1e-6
    )
    # 100 ppm over 1 s shifts the tail by ~4.8 samples; the signals decorrelate
    # at the end but not the start
    assert float(jnp.abs(y[:1000] - x[:1000]).max()) < 0.01


def test_streaming_receiver_with_clock_tracking():
    """track=True in the streaming receiver rescues drifted frames that the
    block demodulator loses to accumulated timing error."""
    from anet.stream import receive_stream

    cfg = ModemConfig(symbol_rate_hz=1500, num_tones=4, preamble_symbols=16)
    P = 256
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, P, dtype=np.uint8) for _ in range(2)]
    parts = []
    for g, p in zip((900, 2400), payloads):
        parts += [np.zeros(g, np.float32), np.asarray(transmit(cfg, jnp.asarray(p)))]
    cap = np.concatenate(parts + [np.zeros(3000, np.float32)])
    chunk = 1024
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    drifted = awgn(
        jax.random.PRNGKey(1), sample_rate_drift(jnp.asarray(cap), 500.0), 14.0
    )
    plain = receive_stream(cfg, drifted, chunk, P)
    tracked = receive_stream(cfg, drifted, chunk, P, track=True)
    assert int(plain.carry.frames_ok) == 0  # drift defeats block demod
    assert int(tracked.carry.frames_ok) == 2
    # negative drift stretches frames past their nominal length; the
    # tracking margin must keep the tail inside the demod window
    stretched = awgn(
        jax.random.PRNGKey(1), sample_rate_drift(jnp.asarray(cap), -500.0), 14.0
    )
    tracked_neg = receive_stream(cfg, stretched, chunk, P, track=True)
    assert int(tracked_neg.carry.frames_ok) == 2
    det = np.asarray(tracked.steps.detected)
    idx = np.nonzero(det)[0]
    for j, i in enumerate(idx):
        assert np.array_equal(
            np.asarray(tracked.steps.frame.payload)[i], payloads[j]
        )


def test_streaming_track_rejects_ofdm():
    from anet.dsp.ofdm import OfdmConfig
    from anet.stream import receive_stream

    with pytest.raises(ValueError, match="MFSK"):
        receive_stream(OfdmConfig(), jnp.zeros(4800 * 2), 480, 16, track=True)
