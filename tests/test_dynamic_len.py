"""Variable-length frames: payload length read from the frame header.

The reference's wire protocol is length-prefixed (varint-delimited,
network.cpp:409-430) — the receiver learns each frame's size from the
frame itself. These tests cover the TPU formulation: max-length static
windows, masked CRC over the declared length, dynamic trailer gather.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anet.channel import awgn
from anet.dsp import ofdm
from anet.dsp.family import frame_samples
from anet.dsp.frame import (
    data_section_air_bits_array,
    frame_result_from_bits_dynamic,
)
from anet.dsp.ofdm import OfdmConfig
from anet.dsp.params import ModemConfig
from anet.dsp.pipeline import receive_frame_dynamic, transmit
from anet.stream import receive_stream_dynamic

CFG = ModemConfig()
MAX = 256


def _padded_capture(cfg, payload, lead=400):
    wave = (
        ofdm.transmit(cfg, payload)
        if isinstance(cfg, OfdmConfig)
        else transmit(cfg, payload)
    )
    t_max = frame_samples(cfg, MAX)
    return jnp.concatenate([jnp.zeros(lead), wave, jnp.zeros(t_max)])


@pytest.mark.parametrize("n", [0, 1, 100, MAX])
def test_mfsk_dynamic_lengths(n):
    payload = jnp.asarray(np.random.default_rng(n).integers(0, 256, n, np.uint8))
    r = receive_frame_dynamic(CFG, _padded_capture(CFG, payload), MAX)
    assert bool(r.frame.ok)
    assert int(r.frame.payload_len) == n
    assert np.array_equal(np.asarray(r.frame.payload[:n]), np.asarray(payload))
    # padding past the declared length is zeroed
    assert int(np.asarray(r.frame.payload[n:]).sum()) == 0


def test_ofdm_dynamic_length():
    cfg = OfdmConfig()
    payload = jnp.asarray(np.random.default_rng(1).integers(0, 256, 77, np.uint8))
    r = receive_frame_dynamic(cfg, _padded_capture(cfg, payload), MAX)
    assert bool(r.frame.ok)
    assert int(r.frame.payload_len) == 77
    assert np.array_equal(np.asarray(r.frame.payload[:77]), np.asarray(payload))


def test_dynamic_batched_different_lengths():
    """One batched receive where each stream declares a different length."""
    rng = np.random.default_rng(2)
    pays = [rng.integers(0, 256, n, np.uint8) for n in (30, 120)]
    caps = [np.asarray(_padded_capture(CFG, jnp.asarray(p))) for p in pays]
    m = max(c.shape[-1] for c in caps)
    batch = jnp.asarray(
        np.stack([np.pad(c, (0, m - len(c))) for c in caps])
    )
    r = receive_frame_dynamic(CFG, batch, MAX)
    assert np.asarray(r.frame.ok).all()
    assert np.asarray(r.frame.payload_len).tolist() == [30, 120]
    for i, p in enumerate(pays):
        got = np.asarray(r.frame.payload)[i, : len(p)]
        assert np.array_equal(got, p)


def test_dynamic_survives_noise():
    payload = jnp.asarray(np.random.default_rng(3).integers(0, 256, 64, np.uint8))
    cap = awgn(jax.random.PRNGKey(0), _padded_capture(CFG, payload), 10.0)
    r = receive_frame_dynamic(CFG, cap, MAX)
    assert bool(r.frame.ok)
    assert int(r.frame.payload_len) == 64


def test_dynamic_rejects_noise_only():
    cap = jnp.asarray(
        np.random.default_rng(4).normal(0, 1, frame_samples(CFG, MAX) + 1000)
    ).astype(jnp.float32)
    r = receive_frame_dynamic(CFG, cap, MAX)
    assert not bool(r.frame.ok)


def test_corrupted_length_field_fails_header_crc():
    payload = jnp.asarray(np.arange(50, dtype=np.uint8))
    bits = data_section_air_bits_array(CFG, payload)
    # pad the section bits out to the max-length window the parser expects
    need = 8 * (12 + MAX)
    bits = jnp.concatenate([bits, jnp.zeros(need - bits.shape[-1], jnp.uint8)])
    good = frame_result_from_bits_dynamic(
        CFG, bits, MAX, confidence=jnp.float32(1), snr_db=jnp.float32(30)
    )
    assert bool(good.ok) and int(good.payload_len) == 50
    # flip the LSB of the length field (bit 47 of the header)
    bad_bits = bits.at[47].set(1 - bits[47])
    bad = frame_result_from_bits_dynamic(
        CFG, bad_bits, MAX, confidence=jnp.float32(1), snr_db=jnp.float32(30)
    )
    assert not bool(bad.header_crc_ok)
    assert not bool(bad.ok)


def test_dynamic_rejects_block_interleaver():
    """Coded dynamic frames are supported with fec_interleave <= 1; a
    depth-d block interleaver's geometry depends on the declared length,
    which is the documented exclusion."""
    cfg = ModemConfig(fec="conv", fec_interleave=24)
    with pytest.raises(ValueError, match="interleave"):
        receive_frame_dynamic(
            cfg, jnp.zeros(frame_samples(cfg, MAX) + 100), MAX
        )


CODED_CFG = ModemConfig(fec="conv", fec_interleave=1)


@pytest.mark.parametrize("n", [0, 1, 100, MAX])
def test_coded_dynamic_lengths(n):
    """Variable-length CODED frames: header probe + masked-trellis
    Viterbi (frame.frame_result_from_llrs_dynamic)."""
    payload = jnp.asarray(np.random.default_rng(n).integers(0, 256, n, np.uint8))
    r = receive_frame_dynamic(CODED_CFG, _padded_capture(CODED_CFG, payload), MAX)
    assert bool(r.frame.ok)
    assert int(r.frame.payload_len) == n
    assert np.array_equal(np.asarray(r.frame.payload[:n]), np.asarray(payload))
    assert int(np.asarray(r.frame.payload[n:]).sum()) == 0


def test_coded_dynamic_equals_fixed_decode():
    """The masked-trellis dynamic decode must be EXACTLY the fixed-length
    decode of the same noisy frame (the zero-LLR pad region freezes the
    path metrics, so the traceback reproduces the true-length ML path)."""
    from anet.dsp.pipeline import receive_frame

    rng = np.random.default_rng(99)
    n = 57
    payload = jnp.asarray(rng.integers(0, 256, n, np.uint8))
    cap = _padded_capture(CODED_CFG, payload)
    noisy = awgn(jax.random.PRNGKey(3), cap, 2.0)
    r_dyn = receive_frame_dynamic(CODED_CFG, noisy, MAX)
    r_fix = receive_frame(CODED_CFG, noisy[: 400 + frame_samples(CODED_CFG, n) + 200], n)
    assert bool(r_dyn.frame.ok) and bool(r_fix.frame.ok)
    assert np.array_equal(
        np.asarray(r_dyn.frame.payload[:n]), np.asarray(r_fix.frame.payload)
    )


def test_coded_dynamic_survives_noise():
    rng = np.random.default_rng(21)
    payload = jnp.asarray(rng.integers(0, 256, 80, np.uint8))
    cap = _padded_capture(CODED_CFG, payload)
    noisy = awgn(jax.random.PRNGKey(11), cap, -2.0)
    r = receive_frame_dynamic(CODED_CFG, noisy, MAX)
    assert bool(r.frame.ok)
    assert int(r.frame.payload_len) == 80
    assert np.array_equal(np.asarray(r.frame.payload[:80]), np.asarray(payload))


def test_stream_dynamic_coded_mixed_lengths():
    """Mixed-length coded frames through receive_stream_dynamic — the
    round-4 capability hole (robust presets could not stream
    variable-length frames at all), search and lock modes both."""
    from anet.models import get_model

    cfg = get_model("mfsk4-coded-stream").config
    rng = np.random.default_rng(31)
    lens = (40, 200, 12)
    pays = [rng.integers(0, 256, n, np.uint8) for n in lens]
    t_max = frame_samples(cfg, MAX)
    parts = []
    for gap, p in zip((700, 900, 1100), pays):
        parts += [np.zeros(gap, np.float32), np.asarray(transmit(cfg, jnp.asarray(p)))]
    parts.append(np.zeros(t_max + 500, np.float32))
    cap = np.concatenate(parts)
    chunk = 2048
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    cap = cap + 0.01 * rng.standard_normal(cap.shape).astype(np.float32)
    res = receive_stream_dynamic(cfg, jnp.asarray(cap), chunk, MAX)
    assert int(res.carry.frames_ok) == 3
    assert int(res.carry.decode_errors) == 0
    det = np.asarray(res.steps.detected)
    idx = np.nonzero(det)[0]
    assert np.asarray(res.steps.frame.payload_len)[idx].tolist() == list(lens)
    payloads = np.asarray(res.steps.frame.payload)
    for i, p in zip(idx, pays):
        assert np.array_equal(payloads[i, : len(p)], p)


def test_stream_dynamic_coded_lock_back_to_back():
    """Dynamic frame-lock on back-to-back mixed-length CODED frames: the
    CRC-vouched header length predicts each next start."""
    from anet.dsp.frame import dynamic_frame_samples
    from anet.models import get_model

    cfg = get_model("mfsk4-coded-stream").config
    rng = np.random.default_rng(33)
    lens = (64, 16, 128, 16, 64)
    pays = [rng.integers(0, 256, n, np.uint8) for n in lens]
    parts = [np.zeros(800, np.float32)]
    parts += [np.asarray(transmit(cfg, jnp.asarray(p))) for p in pays]
    t_max = frame_samples(cfg, MAX)
    parts.append(np.zeros(t_max + 500, np.float32))
    cap = np.concatenate(parts)
    t_min = int(dynamic_frame_samples(cfg, min(lens)))
    chunk = t_min // 128 * 128
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    cap = cap + 0.01 * rng.standard_normal(cap.shape).astype(np.float32)
    res_lock = receive_stream_dynamic(cfg, jnp.asarray(cap), chunk, MAX, lock=True)
    res_search = receive_stream_dynamic(cfg, jnp.asarray(cap), chunk, MAX)
    for res in (res_lock, res_search):
        assert int(res.carry.frames_ok) == len(lens)
        assert int(res.carry.decode_errors) == 0
    d0 = np.asarray(res_search.steps.detected)
    d1 = np.asarray(res_lock.steps.detected)
    assert (d0 == d1).all()
    p0 = np.asarray(res_search.steps.frame.payload)[d0]
    p1 = np.asarray(res_lock.steps.frame.payload)[d1]
    assert np.array_equal(p0, p1)


def test_stream_dynamic_mixed_lengths():
    """Frames of different sizes in one capture, decoded by one scan."""
    rng = np.random.default_rng(5)
    pays = [rng.integers(0, 256, n, np.uint8) for n in (40, 200, 12)]
    t_max = frame_samples(CFG, MAX)
    parts = []
    for gap, p in zip((700, 900, 1100), pays):
        parts += [np.zeros(gap, np.float32), np.asarray(transmit(CFG, jnp.asarray(p)))]
    parts.append(np.zeros(t_max + 500, np.float32))
    cap = np.concatenate(parts)
    chunk = 1024
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    res = receive_stream_dynamic(CFG, jnp.asarray(cap), chunk, MAX)
    assert int(res.carry.frames_ok) == 3
    assert int(res.carry.decode_errors) == 0
    det = np.asarray(res.steps.detected)
    idx = np.nonzero(det)[0]
    lens = np.asarray(res.steps.frame.payload_len)[idx]
    assert lens.tolist() == [40, 200, 12]
    payloads = np.asarray(res.steps.frame.payload)
    for j, (i, p) in enumerate(zip(idx, pays)):
        assert np.array_equal(payloads[i, : len(p)], p)


def test_stream_dynamic_two_short_frames_one_chunk():
    """Two SHORT frames whose max-length detection windows complete within
    the same chunk: the single-candidate default keeps only the better
    match, max_frames_per_chunk=2 decodes both (each extra slot is one
    more fixed-cost demod per chunk)."""
    rng = np.random.default_rng(8)
    pays = [rng.integers(0, 256, 8, np.uint8) for _ in range(2)]
    waves = [np.asarray(transmit(CFG, jnp.asarray(p))) for p in pays]
    t_max = frame_samples(CFG, MAX)
    chunk = 8192
    gap = 100
    # place both frames' (start + t_max) completion points inside ONE chunk
    lead = chunk - (t_max - 1) % chunk + 100
    starts = [lead, lead + len(waves[0]) + gap]
    assert (starts[0] + t_max - 1) // chunk == (starts[1] + t_max - 1) // chunk
    cap = np.concatenate(
        [
            np.zeros(lead, np.float32),
            waves[0],
            np.zeros(gap, np.float32),
            waves[1],
            np.zeros(t_max + 600, np.float32),
        ]
    )
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])

    r1 = receive_stream_dynamic(CFG, jnp.asarray(cap), chunk, MAX)
    assert int(r1.carry.frames_ok) == 1  # the documented one-per-chunk limit

    r2 = receive_stream_dynamic(
        CFG, jnp.asarray(cap), chunk, MAX, max_frames_per_chunk=2
    )
    assert int(r2.carry.frames_ok) == 2
    assert int(r2.carry.decode_errors) == 0
    det = np.asarray(r2.steps.detected)  # [num_chunks, K]
    assert det.sum() == 2
    got_starts = sorted(np.asarray(r2.steps.frame_start)[det].tolist())
    assert got_starts == starts
    # payloads recovered, matched to their time order
    frames = np.asarray(r2.steps.frame.payload)[det]
    order = np.argsort(np.asarray(r2.steps.frame_start)[det])
    for p, i in zip(pays, order):
        assert np.array_equal(frames[i, : len(p)], p)


def test_stream_dynamic_multi_candidate_no_double_count():
    """K=2 on a stream of well-separated frames must not double-detect:
    the second slot's candidates are masked by the first's extent and the
    header gate rejects sidelobes."""
    rng = np.random.default_rng(9)
    pays = [rng.integers(0, 256, n, np.uint8) for n in (40, 200, 12)]
    t_max = frame_samples(CFG, MAX)
    parts = []
    for gapn, p in zip((700, 900, 1100), pays):
        parts += [np.zeros(gapn, np.float32), np.asarray(transmit(CFG, jnp.asarray(p)))]
    parts.append(np.zeros(t_max + 500, np.float32))
    cap = np.concatenate(parts)
    chunk = 1024
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    res = receive_stream_dynamic(
        CFG, jnp.asarray(cap), chunk, MAX, max_frames_per_chunk=2
    )
    assert int(res.carry.frames_ok) == 3
    assert int(res.carry.frames_detected) == 3
    assert int(res.carry.decode_errors) == 0


def test_stream_dynamic_resume_checkpoint():
    """Splitting the capture across two calls with a carried checkpoint
    decodes the same frames as one call."""
    rng = np.random.default_rng(6)
    pays = [rng.integers(0, 256, n, np.uint8) for n in (60, 150)]
    t_max = frame_samples(CFG, MAX)
    parts = []
    for gap, p in zip((800, 1300), pays):
        parts += [np.zeros(gap, np.float32), np.asarray(transmit(CFG, jnp.asarray(p)))]
    parts.append(np.zeros(t_max + 500, np.float32))
    cap = np.concatenate(parts)
    chunk = 1024
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    half = (len(cap) // chunk // 2) * chunk
    r1 = receive_stream_dynamic(CFG, jnp.asarray(cap[:half]), chunk, MAX)
    r2 = receive_stream_dynamic(
        CFG, jnp.asarray(cap[half:]), chunk, MAX, carry=r1.carry
    )
    # counters carry across the checkpoint: the final tally covers both halves
    assert int(r2.carry.frames_ok) == 2
    assert int(r2.carry.decode_errors) == 0


def test_cli_dynamic_roundtrip(tmp_path, capsys):
    import os

    from anet.cli import main

    payload = tmp_path / "p.bin"
    payload.write_bytes(os.urandom(90))
    cap = tmp_path / "c.f32"
    back = tmp_path / "b.bin"
    assert main(["modem-tx", str(payload), "--out", str(cap)]) == 0
    # no --len: the receiver reads the length from the header
    assert main(["modem-rx", str(cap), "--out", str(back)]) == 0
    assert back.read_bytes() == payload.read_bytes()
    out = capsys.readouterr().out
    assert "len=90" in out


def test_cli_stream_dynamic(tmp_path, capsys):
    import os

    from anet.cli import main

    rng = np.random.default_rng(7)
    blobs = [os.urandom(35), os.urandom(180)]
    waves = []
    for b in blobs:
        waves.append(np.asarray(transmit(CFG, jnp.asarray(np.frombuffer(b, np.uint8)))))
    cap = np.concatenate(
        [np.zeros(600, np.float32), waves[0], np.zeros(900, np.float32), waves[1]]
    )
    f = tmp_path / "stream.f32"
    cap.astype(np.float32).tofile(f)
    back = tmp_path / "all.bin"
    assert main(["modem-stream-rx", str(f), "--out", str(back)]) == 0
    assert back.read_bytes() == b"".join(blobs)
    out = capsys.readouterr().out
    assert "len=35" in out and "len=180" in out


def test_cli_stream_dynamic_lock(tmp_path, capsys):
    """--lock with headers-from-stream mode: back-to-back mixed-length
    frames decode through the dynamic frame-lock path."""
    import os

    from anet.cli import main

    blobs = [os.urandom(20), os.urandom(60), os.urandom(35)]
    waves = [
        np.asarray(transmit(CFG, jnp.asarray(np.frombuffer(b, np.uint8))))
        for b in blobs
    ]
    cap = np.concatenate([np.zeros(600, np.float32)] + waves)
    f = tmp_path / "stream.f32"
    cap.astype(np.float32).tofile(f)
    back = tmp_path / "all.bin"
    assert main(
        ["modem-stream-rx", str(f), "--out", str(back), "--lock",
         "--chunk", "1024", "--max-len", "64"]
    ) == 0
    assert back.read_bytes() == b"".join(blobs)
    out = capsys.readouterr().out
    assert "len=20" in out and "len=60" in out and "len=35" in out


def test_cli_stream_dynamic_lock_rejects_multi_candidate(tmp_path, capsys):
    from anet.cli import main

    f = tmp_path / "x.f32"
    np.zeros(4096, np.float32).tofile(f)
    rc = main(
        ["modem-stream-rx", str(f), "--lock", "--frames-per-chunk", "2"]
    )
    assert rc == 2
    assert "frames-per-chunk 1" in capsys.readouterr().err


def test_cli_stream_checkpoint_resume(tmp_path, capsys):
    """Split a capture across two CLI invocations with --save-state /
    --resume; a frame straddling the split decodes in the second run."""
    import os

    from anet.cli import main

    blob_a, blob_b = os.urandom(120), os.urandom(120)
    wa = np.asarray(transmit(CFG, jnp.asarray(np.frombuffer(blob_a, np.uint8))))
    wb = np.asarray(transmit(CFG, jnp.asarray(np.frombuffer(blob_b, np.uint8))))
    cap = np.concatenate(
        [np.zeros(600, np.float32), wa, np.zeros(900, np.float32), wb]
    ).astype(np.float32)
    # split mid-second-frame, NOT on a chunk boundary (exercises the
    # pending-tail mechanism: no zeros may be spliced into frame b)
    split = 600 + len(wa) + 900 + len(wb) // 2 + 37
    f1, f2 = tmp_path / "h1.f32", tmp_path / "h2.f32"
    cap[:split].tofile(f1)
    cap[split:].tofile(f2)
    state = tmp_path / "state.npz"
    o1, o2 = tmp_path / "o1.bin", tmp_path / "o2.bin"
    rc1 = main([
        "modem-stream-rx", str(f1), "--len", "120", "--out", str(o1),
        "--save-state", str(state),
    ])
    assert state.exists()
    rc2 = main([
        "modem-stream-rx", str(f2), "--len", "120", "--out", str(o2),
        "--resume", str(state),
    ])
    assert rc2 == 0
    out = capsys.readouterr().out
    assert "resumed stream state" in out
    # frame a completes within the first half; frame b straddles the split
    # and must decode in the resumed run
    assert rc1 == 0 and o1.read_bytes() == blob_a
    assert o2.read_bytes() == blob_b


def test_stream_dynamic_ofdm():
    """The dynamic streaming receiver is family-generic: OFDM frames of
    different sizes decode from one scan with lengths from their headers."""
    cfg = OfdmConfig()
    rng = np.random.default_rng(9)
    pays = [rng.integers(0, 256, n, np.uint8) for n in (25, 130)]
    t_max = frame_samples(cfg, MAX)
    parts = []
    for gap, p in zip((500, 800), pays):
        parts += [
            np.zeros(gap, np.float32),
            np.asarray(ofdm.transmit(cfg, jnp.asarray(p))),
        ]
    parts.append(np.zeros(t_max + 300, np.float32))
    cap = np.concatenate(parts)
    chunk = 640  # = 2 OFDM symbols
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    res = receive_stream_dynamic(cfg, jnp.asarray(cap), chunk, MAX)
    assert int(res.carry.frames_ok) == 2
    idx = np.nonzero(np.asarray(res.steps.detected))[0]
    assert np.asarray(res.steps.frame.payload_len)[idx].tolist() == [25, 130]
    payloads = np.asarray(res.steps.frame.payload)
    for i, p in zip(idx, pays):
        assert np.array_equal(payloads[i, : len(p)], p)


def test_stream_dynamic_survives_noise():
    rng = np.random.default_rng(10)
    pays = [rng.integers(0, 256, n, np.uint8) for n in (50, 180)]
    t_max = frame_samples(CFG, MAX)
    parts = []
    for gap, p in zip((800, 1200), pays):
        parts += [np.zeros(gap, np.float32), np.asarray(transmit(CFG, jnp.asarray(p)))]
    parts.append(np.zeros(t_max + 400, np.float32))
    cap = np.concatenate(parts)
    chunk = 1024
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    noisy = awgn(jax.random.PRNGKey(3), jnp.asarray(cap), 10.0)
    res = receive_stream_dynamic(CFG, noisy, chunk, MAX)
    assert int(res.carry.frames_ok) == 2
    idx = np.nonzero(np.asarray(res.steps.detected))[0]
    assert np.asarray(res.steps.frame.payload_len)[idx].tolist() == [50, 180]


def test_cli_stream_rx_frames_per_chunk(tmp_path, capsys):
    """--frames-per-chunk recovers two short frames whose detections land
    in the same chunk, concatenated to --out in stream order."""
    import numpy as np

    import anet.cli as cli
    from anet.dsp import family
    from anet.models import get_model

    cfg = get_model("mfsk16-fast").config
    rng = np.random.default_rng(8)
    p1 = bytes(rng.integers(0, 256, 16, np.uint8))
    p2 = bytes(rng.integers(0, 256, 16, np.uint8))
    w1 = np.asarray(family.transmit_fn(cfg)(jnp.asarray(np.frombuffer(p1, np.uint8))))
    w2 = np.asarray(family.transmit_fn(cfg)(jnp.asarray(np.frombuffer(p2, np.uint8))))
    t_max = family.frame_samples(cfg, 64)
    # both frames complete within one max-window chunk
    cap = np.zeros(2 * (len(w1) + 200), np.float32)
    cap[100 : 100 + len(w1)] = w1
    start2 = 100 + len(w1) + 200
    cap[start2 : start2 + len(w2)] = w2
    f = tmp_path / "cap.f32"
    cap.astype(np.float32).tofile(f)
    out = tmp_path / "out.bin"
    rc = cli.main(
        ["modem-stream-rx", str(f), "--model", "mfsk16-fast", "--max-len", "64",
         "--chunk", str(t_max), "--frames-per-chunk", "2", "--out", str(out)]
    )
    assert rc == 0
    assert out.read_bytes() == p1 + p2
    # the geometry-derived default also recovers both (it sizes K so no
    # dense layout of short frames can drop one)
    out_auto = tmp_path / "out_auto.bin"
    rc = cli.main(
        ["modem-stream-rx", str(f), "--model", "mfsk16-fast", "--max-len", "64",
         "--chunk", str(t_max), "--out", str(out_auto)]
    )
    assert rc == 0
    assert out_auto.read_bytes() == p1 + p2
    # an explicit K=1 on the same capture loses one — the limitation the
    # derived default exists to avoid
    out1 = tmp_path / "out1.bin"
    cli.main(
        ["modem-stream-rx", str(f), "--model", "mfsk16-fast", "--max-len", "64",
         "--chunk", str(t_max), "--frames-per-chunk", "1", "--out", str(out1)]
    )
    assert len(out1.read_bytes()) < 32
