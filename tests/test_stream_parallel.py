"""Streaming-runtime and multi-device tests.

Covers BASELINE configs 3-5: batched streams through the channel, chunked-
scan streaming demod with preamble sync on long captures, and the sharded
BER sweep — all on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anet.channel import ChannelConfig, awgn
from anet.dsp import ModemConfig
from anet.dsp.frame import frame_num_samples
from anet.dsp.pipeline import transmit
from anet.parallel import (
    ber_sweep,
    make_mesh,
    shard_streams,
    sharded_demodulate,
    sharded_receive_long_capture,
)
from anet.stream import init_carry, receive_stream

CFG = ModemConfig(symbol_rate_hz=1500, num_tones=4, preamble_symbols=16)
PAYLOAD_LEN = 32
CHUNK = 512


def _make_capture(gaps, payload_seed=1, snr_db=12.0, align=CHUNK):
    rng = np.random.default_rng(payload_seed)
    payloads = [rng.integers(0, 256, PAYLOAD_LEN, dtype=np.uint8) for _ in gaps]
    waves = [np.asarray(transmit(CFG, jnp.asarray(p))) for p in payloads]
    parts = []
    starts = []
    pos = 0
    for g, w in zip(gaps, waves):
        parts.append(np.zeros(g, np.float32))
        pos += g
        starts.append(pos)
        parts.append(w)
        pos += len(w)
    parts.append(np.zeros(4000, np.float32))
    cap = np.concatenate(parts)
    cap = np.concatenate([cap, np.zeros((-len(cap)) % align, np.float32)])
    cap = np.asarray(awgn(jax.random.PRNGKey(7), jnp.asarray(cap), snr_db))
    return jnp.asarray(cap), payloads, starts


# --- chunked-scan streaming --------------------------------------------------

def test_stream_finds_all_frames_exact_offsets():
    cap, payloads, starts = _make_capture([700, 1300, 451])
    res = receive_stream(CFG, cap, CHUNK, PAYLOAD_LEN)
    assert int(res.carry.frames_detected) == 3
    assert int(res.carry.frames_ok) == 3
    assert int(res.carry.decode_errors) == 0
    det = np.asarray(res.steps.detected)
    idx = np.nonzero(det)[0]
    assert np.asarray(res.steps.frame_start)[idx].tolist() == starts
    for j, i in enumerate(idx):
        assert np.array_equal(np.asarray(res.steps.frame.payload)[i], payloads[j])


def test_stream_checkpoint_resume_matches_single_pass():
    """Explicit carry state makes resume exact (SURVEY.md §5 checkpoint)."""
    cap, _, _ = _make_capture([900, 2000])
    full = receive_stream(CFG, cap, CHUNK, PAYLOAD_LEN)
    half = (cap.shape[-1] // 2) // CHUNK * CHUNK
    r1 = receive_stream(CFG, cap[:half], CHUNK, PAYLOAD_LEN)
    r2 = receive_stream(CFG, cap[half:], CHUNK, PAYLOAD_LEN, carry=r1.carry)
    assert int(r2.carry.frames_ok) == int(full.carry.frames_ok) == 2
    assert int(r2.carry.samples_seen) == int(full.carry.samples_seen)


def test_stream_counts_decode_errors():
    """A frame with a corrupted payload is a decode error, not a miss."""
    cap, payloads, starts = _make_capture([800], snr_db=60.0)
    cap = np.array(cap)
    sps = CFG.samples_per_symbol
    # Zero out payload symbols mid-frame (past header) of the only frame.
    s = starts[0] + (CFG.preamble_symbols + 40) * sps
    cap[s : s + 5 * sps] = 0.0
    res = receive_stream(CFG, jnp.asarray(cap), CHUNK, PAYLOAD_LEN)
    assert int(res.carry.frames_detected) == 1
    assert int(res.carry.frames_ok) == 0
    assert int(res.carry.decode_errors) == 1


def test_stream_silence_finds_nothing():
    silence = awgn(jax.random.PRNGKey(0), jnp.zeros(40 * CHUNK), -20.0)
    res = receive_stream(CFG, silence, CHUNK, PAYLOAD_LEN)
    assert int(res.carry.frames_detected) == 0


def test_stream_partial_frame_overlap_no_false_lock():
    """Frame tail + silence windows must not fire (header gate)."""
    cap, _, _ = _make_capture([1000])
    res = receive_stream(CFG, cap, CHUNK, PAYLOAD_LEN)
    assert int(res.carry.frames_detected) == 1  # exactly once


def test_stream_batched_streams():
    caps = []
    for seed in range(3):
        cap, _, _ = _make_capture([600 + 37 * seed], payload_seed=seed)
        caps.append(np.asarray(cap))
    n = min(c.shape[-1] for c in caps) // CHUNK * CHUNK
    batch = jnp.asarray(np.stack([c[:n] for c in caps]))
    res = receive_stream(CFG, batch, CHUNK, PAYLOAD_LEN)
    assert np.asarray(res.carry.frames_ok).tolist() == [1, 1, 1]


def test_stream_rejects_bad_geometry():
    with pytest.raises(ValueError, match="multiple of chunk_size"):
        receive_stream(CFG, jnp.zeros(1000), 512, PAYLOAD_LEN)
    # buffers SHORTER than frame + chunk (the legacy unpadded minimum)
    # cannot hold a live window and are rejected; anything in
    # [legacy, padded] is accepted (excess = zero tail pad — round-4
    # ADVICE widened the acceptance from three exact lengths)
    carry = init_carry(CFG, 512, PAYLOAD_LEN)
    short = carry._replace(buffer=carry.buffer[..., : 6400 - 128])
    with pytest.raises(ValueError, match="carry buffer"):
        receive_stream(CFG, jnp.zeros(1024), 512, PAYLOAD_LEN, carry=short)


# --- mesh / sharding ---------------------------------------------------------

def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_demodulate_matches_local():
    mesh = make_mesh()
    payloads = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (16, PAYLOAD_LEN), np.uint8)
    )
    waves = transmit(CFG, payloads)
    waves_sharded = shard_streams(mesh, waves)
    res = sharded_demodulate(CFG, mesh, waves_sharded, PAYLOAD_LEN)
    assert np.all(np.asarray(res.ok))
    assert np.array_equal(np.asarray(res.payload), np.asarray(payloads))


def test_ber_sweep_monotone_and_aggregated():
    mesh = make_mesh()
    pt = ber_sweep(
        CFG,
        mesh,
        jax.random.PRNGKey(0),
        snr_grid_db=[-14.0, -8.0, -2.0],
        frames_per_point=32,
        payload_len=PAYLOAD_LEN,
    )
    ber = np.asarray(pt.ber)
    assert np.asarray(pt.total_bits).tolist() == [32 * PAYLOAD_LEN * 8] * 3
    # BER decreases with SNR; extremes sane
    assert ber[0] > ber[1] > ber[2]
    assert ber[0] > 0.2 and ber[2] < 0.05


def test_ber_sweep_validates_divisibility():
    mesh = make_mesh()
    with pytest.raises(ValueError, match="multiple of mesh size"):
        ber_sweep(CFG, mesh, jax.random.PRNGKey(0), [0.0], frames_per_point=3)


def test_sharded_long_capture_boundary_frames():
    """Frames crossing device boundaries are found exactly once (halo via
    ppermute, attribution by frame end)."""
    mesh = make_mesh()
    cap, payloads, starts = _make_capture(
        [9000, 8200, 7900, 9500, 8700], align=8 * CHUNK
    )
    res = sharded_receive_long_capture(CFG, mesh, cap, CHUNK, PAYLOAD_LEN)
    assert int(res.frames_detected) == 5
    assert int(res.frames_ok) == 5
    assert int(res.decode_errors) == 0
    det = np.asarray(res.steps.detected)
    idx = np.nonzero(det)[0]
    assert np.asarray(res.steps.frame_start)[idx].tolist() == starts
    for j, i in enumerate(idx):
        assert np.array_equal(np.asarray(res.steps.frame.payload)[i], payloads[j])


def test_sharded_long_capture_matches_single_device_counts():
    mesh = make_mesh()
    cap, _, _ = _make_capture([9000, 9100, 9200], align=8 * CHUNK)
    sharded = sharded_receive_long_capture(CFG, mesh, cap, CHUNK, PAYLOAD_LEN)
    local = receive_stream(CFG, cap, CHUNK, PAYLOAD_LEN)
    assert int(sharded.frames_ok) == int(local.carry.frames_ok) == 3


def test_sharded_long_capture_rejects_short_segments():
    mesh = make_mesh()
    with pytest.raises(ValueError, match="demodulator memory"):
        sharded_receive_long_capture(
            CFG, mesh, jnp.zeros(8 * CHUNK), CHUNK, PAYLOAD_LEN
        )


def test_ber_sweep_ofdm_family():
    """The sweep dispatches on the modulation family (OFDM included)."""
    from anet.dsp.ofdm import OfdmConfig

    mesh = make_mesh()
    pt = ber_sweep(
        OfdmConfig(),
        mesh,
        jax.random.PRNGKey(0),
        snr_grid_db=[4.0, 16.0],
        frames_per_point=16,
        payload_len=32,
    )
    ber = np.asarray(pt.ber)
    assert ber[0] > 0.02   # below OFDM's operating point
    assert ber[1] < 0.005  # comfortably inside it
    assert np.asarray(pt.total_bits).tolist() == [16 * 32 * 8] * 2


def test_2d_mesh_capture_grid():
    """DP x CP composition: a batch of captures sharded over streams, each
    timeline split over the time axis with ppermute halos per row."""
    from anet.parallel import make_mesh_2d, sharded_receive_capture_grid

    mesh = make_mesh_2d(4, 2)
    assert dict(mesh.shape) == {"streams": 4, "time": 2}
    rng = np.random.default_rng(0)
    B, n_frames = 8, 2
    truth, caps = [], []
    for bidx in range(B):
        payloads = [rng.integers(0, 256, PAYLOAD_LEN, dtype=np.uint8) for _ in range(n_frames)]
        parts, pos, starts = [], 0, []
        # second gap pushes the second frame across the time-shard boundary
        for g, p in zip((800 + 137 * bidx, 9000 + 91 * bidx), payloads):
            w = np.asarray(transmit(CFG, jnp.asarray(p)))
            parts.append(np.zeros(g, np.float32))
            pos += g
            starts.append(pos)
            parts.append(w)
            pos += len(w)
        caps.append(np.concatenate(parts + [np.zeros(6000, np.float32)]))
        truth.append((payloads, starts))
    blk = 2 * CHUNK
    n = ((max(map(len, caps)) + blk - 1) // blk) * blk
    capture = np.zeros((B, n), np.float32)
    for i, c in enumerate(caps):
        capture[i, : len(c)] = c
    capture = awgn(jax.random.PRNGKey(3), jnp.asarray(capture), 12.0)
    res = sharded_receive_capture_grid(CFG, mesh, capture, CHUNK, PAYLOAD_LEN)
    assert int(res.frames_ok) == B * n_frames
    assert int(res.decode_errors) == 0
    det = np.asarray(res.steps.detected)
    for bidx in range(B):
        idx = np.nonzero(det[bidx])[0]
        exp_p, exp_s = truth[bidx]
        assert np.asarray(res.steps.frame_start)[bidx][idx].tolist() == exp_s
        for i, p in zip(idx, exp_p):
            assert np.array_equal(np.asarray(res.steps.frame.payload)[bidx][i], p)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stream_random_frame_layout_property(seed):
    """Property: every frame placed with at least one chunk of spacing in
    a random layout is detected and decoded by the streaming receiver."""
    import numpy as np

    from anet.dsp.family import frame_samples, transmit_fn
    from anet.stream import receive_stream

    cfg = CFG
    payload_len = 24
    t_frame = frame_samples(cfg, payload_len)
    chunk = 512
    rng = np.random.default_rng(seed)
    n_frames = int(rng.integers(2, 5))
    payloads = rng.integers(0, 256, (n_frames, payload_len), np.uint8)
    waves = [np.asarray(transmit_fn(cfg)(jnp.asarray(p))) for p in payloads]
    pos, placed = 0, []
    for w in waves:
        pos += int(rng.integers(chunk, 3 * chunk))  # gap >= one chunk
        placed.append((pos, w))
        pos += len(w)
    total = -(-(pos + t_frame) // chunk) * chunk
    cap = np.zeros(total, np.float32)
    for p, w in placed:
        cap[p : p + len(w)] = w
    cap += rng.normal(0, 0.02, total).astype(np.float32)
    res = receive_stream(cfg, jnp.asarray(cap), chunk, payload_len)
    assert int(res.carry.frames_ok) == n_frames, (
        seed,
        int(res.carry.frames_detected),
        int(res.carry.frames_ok),
    )
    det = np.asarray(res.steps.detected)
    starts = np.asarray(res.steps.frame_start)[det]
    got_payloads = np.asarray(res.steps.frame.payload)[det]
    order = np.argsort(starts)
    for i, (p, _) in enumerate(placed):
        idx = order[i]
        assert abs(int(starts[idx]) - p) <= 1, (p, int(starts[idx]))
        assert np.array_equal(got_payloads[idx], payloads[i])


# --- dynamic-length frames composed with scale-out ---------------------------

MAX_DYN = 32


def _make_dynamic_capture(total, placements, seed=5, snr_db=14.0):
    """A [total]-sample capture with variable-length frames at given
    (start, payload_len) placements, light AWGN. Returns (capture,
    {start: payload})."""
    rng = np.random.default_rng(seed)
    cap = np.zeros(total, np.float32)
    frames = {}
    for start, n in placements:
        p = rng.integers(0, 256, n, dtype=np.uint8)
        w = np.asarray(transmit(CFG, jnp.asarray(p)))
        assert start + len(w) <= total
        cap[start : start + len(w)] = w
        frames[start] = p
    cap = np.asarray(awgn(jax.random.PRNGKey(seed), jnp.asarray(cap), snr_db))
    return jnp.asarray(cap), frames


def _detected_frames_dynamic(steps):
    """{start: payload[:len]} for every detected frame in a dynamic steps
    pytree (any leading shape)."""
    det = np.asarray(steps.detected).reshape(-1)
    starts = np.asarray(steps.frame_start).reshape(-1)
    lens = np.asarray(steps.frame.payload_len).reshape(-1)
    pays = np.asarray(steps.frame.payload)
    pays = pays.reshape(-1, pays.shape[-1])
    return {
        int(starts[i]): pays[i, : int(lens[i])].tobytes()
        for i in np.nonzero(det)[0]
    }


def test_sharded_dynamic_matches_single_device():
    """Variable-length frames + time sharding: boundary-straddling frames
    and back-to-back short frames decode identically to one device."""
    from anet.dsp.family import frame_samples
    from anet.parallel import sharded_receive_long_capture_dynamic
    from anet.stream import receive_stream_dynamic

    mesh = make_mesh()
    n_dev = 8
    t_max = frame_samples(CFG, MAX_DYN)
    halo = t_max + CHUNK
    seg = -(-halo // CHUNK) * CHUNK
    total = n_dev * seg
    t_min = frame_num_samples(CFG, 1)
    # one frame fully inside segment 1, one straddling the 2/3 boundary,
    # two back-to-back short frames inside segment 5
    placements = [
        (seg + 100, MAX_DYN),
        (3 * seg - t_min // 2, 8),
        (5 * seg + 40, 4),
        (5 * seg + 40 + t_min + CHUNK, 4),
    ]
    cap, frames = _make_dynamic_capture(total, placements)
    local = receive_stream_dynamic(CFG, cap, CHUNK, MAX_DYN)
    res = sharded_receive_long_capture_dynamic(CFG, mesh, cap, CHUNK, MAX_DYN)
    assert int(res.frames_ok) == int(local.carry.frames_ok) == len(placements)
    assert int(res.frames_detected) == len(placements)
    got = _detected_frames_dynamic(res.steps)
    want = _detected_frames_dynamic(local.steps)
    assert got == want
    assert set(got) == {s for s, _ in placements}
    for start, p in frames.items():
        assert got[start] == p.tobytes()


def test_sharded_dynamic_resume_across_super_steps():
    """checkpoint/resume under sharding: a stream processed in two sharded
    super-steps (with a frame straddling the super-step boundary) matches
    the one-shot result, counters cumulative."""
    from anet.dsp.family import frame_samples
    from anet.parallel import sharded_receive_long_capture_dynamic

    mesh = make_mesh()
    n_dev = 8
    t_max = frame_samples(CFG, MAX_DYN)
    seg = -(-(t_max + CHUNK) // CHUNK) * CHUNK
    half = n_dev * seg
    total = 2 * half
    placements = [
        (2 * seg + 11, 16),
        (half - t_max // 2, MAX_DYN),  # straddles the super-step boundary
        (half + 3 * seg + 77, 5),
    ]
    cap, frames = _make_dynamic_capture(total, placements, seed=9)
    one = sharded_receive_long_capture_dynamic(CFG, mesh, cap, CHUNK, MAX_DYN)
    r1 = sharded_receive_long_capture_dynamic(
        CFG, mesh, cap[:half], CHUNK, MAX_DYN
    )
    r2 = sharded_receive_long_capture_dynamic(
        CFG, mesh, cap[half:], CHUNK, MAX_DYN, resume=r1.resume
    )
    assert int(one.frames_ok) == len(placements)
    assert int(r2.frames_ok) == int(one.frames_ok)
    assert int(r2.frames_detected) == int(one.frames_detected)
    assert int(r2.resume.samples_seen) == total
    got = dict(_detected_frames_dynamic(r1.steps))
    got.update(_detected_frames_dynamic(r2.steps))
    assert got == _detected_frames_dynamic(one.steps)


def test_sharded_fixed_resume_across_super_steps():
    """The fixed-length sharded path resumes the same way."""
    from anet.parallel import sharded_receive_long_capture

    mesh = make_mesh()
    t_frame = frame_num_samples(CFG, PAYLOAD_LEN)
    seg = -(-(t_frame + CHUNK) // CHUNK) * CHUNK
    half = 8 * seg
    # second frame straddles the super-step boundary: starts t_frame//2
    # before `half`, so its decode needs r1's resume tail
    gap2 = half - (700 + t_frame) - t_frame // 2
    cap, _, starts = _make_capture([700, gap2, 900], align=2 * half)
    cap = cap[: 2 * half]
    assert starts[1] == half - t_frame // 2
    one = sharded_receive_long_capture(CFG, mesh, cap, CHUNK, PAYLOAD_LEN)
    r1 = sharded_receive_long_capture(CFG, mesh, cap[:half], CHUNK, PAYLOAD_LEN)
    r2 = sharded_receive_long_capture(
        CFG, mesh, cap[half:], CHUNK, PAYLOAD_LEN, resume=r1.resume
    )
    assert int(one.frames_ok) == 3
    assert int(r2.frames_ok) == 3
    assert int(r2.frames_detected) == int(one.frames_detected)


def test_sharded_grid_dynamic_matches_per_stream():
    """DP x CP with dynamic lengths: a 2x4 mesh farm of variable-length
    streams matches per-stream single-device decode."""
    from anet.dsp.family import frame_samples
    from anet.parallel import make_mesh_2d, sharded_receive_capture_grid_dynamic
    from anet.stream import receive_stream_dynamic

    mesh = make_mesh_2d(2, 4)
    n_t = 4
    t_max = frame_samples(CFG, MAX_DYN)
    seg = -(-(t_max + CHUNK) // CHUNK) * CHUNK
    total = n_t * seg
    caps, wants = [], []
    for b, placements in enumerate(
        [
            [(100, 12), (2 * seg - t_max // 3, MAX_DYN)],
            [(seg + 313, 1), (3 * seg + 17, 24)],
        ]
    ):
        cap, _ = _make_dynamic_capture(total, placements, seed=20 + b)
        caps.append(np.asarray(cap))
        local = receive_stream_dynamic(CFG, cap, CHUNK, MAX_DYN)
        wants.append(_detected_frames_dynamic(local.steps))
    captures = jnp.asarray(np.stack(caps))
    res = sharded_receive_capture_grid_dynamic(
        CFG, mesh, captures, CHUNK, MAX_DYN
    )
    assert int(res.frames_ok) == sum(len(w) for w in wants) == 4
    det = np.asarray(res.steps.detected)  # [B, chunks]
    for b, want in enumerate(wants):
        got = {
            int(np.asarray(res.steps.frame_start)[b, i]): np.asarray(
                res.steps.frame.payload
            )[b, i, : int(np.asarray(res.steps.frame.payload_len)[b, i])].tobytes()
            for i in np.nonzero(det[b])[0]
        }
        assert got == want
    assert res.resume is not None and res.resume.tail.shape == (2, t_max + CHUNK)


def test_sharded_long_capture_lock_matches_search():
    """Frame-lock composes with time sharding: each device acquires once,
    then rides predictions; decoded frames equal the always-search mode."""
    mesh = make_mesh()
    cap, payloads, starts = _make_capture(
        [9000, 0, 0, 0, 7000, 0], align=8 * CHUNK
    )
    r_search = sharded_receive_long_capture(CFG, mesh, cap, CHUNK, PAYLOAD_LEN)
    r_lock = sharded_receive_long_capture(
        CFG, mesh, cap, CHUNK, PAYLOAD_LEN, lock=True
    )
    assert int(r_lock.frames_ok) == int(r_search.frames_ok) == 6
    assert int(r_lock.decode_errors) == int(r_search.decode_errors) == 0
    d0 = np.asarray(r_search.steps.detected)
    d1 = np.asarray(r_lock.steps.detected)
    assert (d0 == d1).all()
    p0 = np.asarray(r_search.steps.frame.payload)[d0]
    p1 = np.asarray(r_lock.steps.frame.payload)[d1]
    assert np.array_equal(p0, p1)


def test_sharded_grid_lock_matches_search():
    from anet.parallel import make_mesh_2d, sharded_receive_capture_grid

    mesh = make_mesh_2d(4, 2)
    caps = []
    metas = []
    for s in range(4):
        cap, payloads, starts = _make_capture(
            [8000 + 100 * s, 0, 0], align=8 * CHUNK
        )
        caps.append(np.asarray(cap))
        metas.append(payloads)
    n = max(c.shape[-1] for c in caps)
    batch = np.zeros((4, n), np.float32)
    for s, c in enumerate(caps):
        batch[s, : c.shape[-1]] = c
    capj = jnp.asarray(batch)
    r0 = sharded_receive_capture_grid(CFG, mesh, capj, CHUNK, PAYLOAD_LEN)
    r1 = sharded_receive_capture_grid(
        CFG, mesh, capj, CHUNK, PAYLOAD_LEN, lock=True
    )
    assert int(r1.frames_ok) == int(r0.frames_ok) == 12
    d0 = np.asarray(r0.steps.detected)
    d1 = np.asarray(r1.steps.detected)
    assert (d0 == d1).all()
    assert np.array_equal(
        np.asarray(r0.steps.frame.payload)[d0],
        np.asarray(r1.steps.frame.payload)[d1],
    )
