"""Frame-lock streaming mode: probe-verified predictions replace the
every-lag search on steady-state chunks (anet.stream stream_step(lock=True)).

The decoded output must be identical to the always-search mode across
layouts: back-to-back frames (the production case — the reference's TCP
reader never re-syncs, network.cpp:409-430), random gaps (acquisition and
re-acquisition), small inter-frame slips (the ±2-sample drift servo), and
noise-only tails (unlock)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anet.dsp import family
from anet.dsp.sync import preamble_quality_probe, preamble_waveform
from anet.models import get_model
from anet.stream import init_carry, receive_stream, stream_step

CFG = get_model("mfsk16-fast").config
PAY = 64
T_FRAME = family.frame_samples(CFG, PAY)
CHUNK = 4096


def _build_capture(rng, gaps_per_stream, payloads, noise=0.05):
    tx = jax.jit(family.transmit_fn(CFG))
    b, n_frames, _ = payloads.shape
    waves = np.asarray(tx(jnp.asarray(payloads.reshape(b * n_frames, PAY))))
    waves = waves.reshape(b, n_frames, T_FRAME)
    caps = []
    for s in range(b):
        sig = []
        for i in range(n_frames):
            sig.append(np.zeros(gaps_per_stream[s][i], np.float32))
            sig.append(waves[s, i])
        caps.append(np.concatenate(sig))
    length = max(len(c) for c in caps) + T_FRAME + CHUNK
    length = -(-length // CHUNK) * CHUNK
    out = np.zeros((b, length), np.float32)
    for s, c in enumerate(caps):
        out[s, : len(c)] = c
    out += noise * rng.standard_normal(out.shape).astype(np.float32)
    return jnp.asarray(out)


def _assert_equal_results(r_search, r_lock, want_ok):
    det0 = np.asarray(r_search.steps.detected)
    det1 = np.asarray(r_lock.steps.detected)
    assert (det0 == det1).all()
    p0 = np.asarray(r_search.steps.frame.payload)[det0]
    p1 = np.asarray(r_lock.steps.frame.payload)[det1]
    assert p0.shape == p1.shape and (p0 == p1).all()
    assert int(r_search.carry.frames_ok.sum()) == want_ok
    assert int(r_lock.carry.frames_ok.sum()) == want_ok
    assert int(r_lock.carry.decode_errors.sum()) == int(
        r_search.carry.decode_errors.sum()
    )


@pytest.mark.parametrize("layout", ["contiguous", "random_gaps", "slip"])
def test_lock_equals_search(layout):
    rng = np.random.default_rng(hash(layout) % 2**31)
    b, n_frames = 3, 5
    payloads = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
    if layout == "contiguous":
        gaps = [[450] + [0] * (n_frames - 1) for _ in range(b)]
    elif layout == "random_gaps":
        gaps = [
            [int(g) for g in rng.integers(0, 3 * CHUNK, n_frames)]
            for _ in range(b)
        ]
    else:  # per-frame 1-2 sample slips: inside the probe's drift servo
        gaps = [
            [777] + [int(g) for g in rng.integers(1, 3, n_frames - 1)]
            for _ in range(b)
        ]
    cap = _build_capture(rng, gaps, payloads)
    r0 = receive_stream(CFG, cap, CHUNK, PAY, lock=False)
    r1 = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
    _assert_equal_results(r0, r1, b * n_frames)


def test_lock_fuzz_random_layouts():
    rng = np.random.default_rng(0xA55)
    for trial in range(4):
        b = int(rng.integers(1, 4))
        n_frames = int(rng.integers(1, 6))
        payloads = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
        gaps = [
            [int(g) for g in rng.integers(0, 2 * CHUNK, n_frames)]
            for _ in range(b)
        ]
        cap = _build_capture(rng, gaps, payloads, noise=float(rng.uniform(0, 0.1)))
        r0 = receive_stream(CFG, cap, CHUNK, PAY, lock=False)
        r1 = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
        _assert_equal_results(r0, r1, b * n_frames)


def test_lock_engages_and_skips_search():
    """Steady state really uses the prediction: the emitted quality on
    detection chunks is the PROBE's value (≈1 clean), and chunks between
    detections report 0.0 — the search-skipped sentinel, proof the cond
    took the cheap branch."""
    rng = np.random.default_rng(5)
    n_frames = 6
    payloads = rng.integers(0, 256, (1, n_frames, PAY), dtype=np.uint8)
    gaps = [[900] + [0] * (n_frames - 1)]
    cap = _build_capture(rng, gaps, payloads, noise=0.0)
    r = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
    det = np.asarray(r.steps.detected)[:, 0]
    q = np.asarray(r.steps.quality)[:, 0]
    assert int(r.carry.frames_ok[0]) == n_frames
    first = int(np.argmax(det))
    last = len(det) - 1 - int(np.argmax(det[::-1]))
    # every locked chunk between detections skipped the search (after the
    # LAST frame the prediction fails on tail noise and search resumes —
    # that chunk legitimately reports a searched noise quality)
    mid = ~det[first:last]
    assert (q[first:last][mid] == 0.0).all()
    assert (q[det] > 0.9).all()


@pytest.mark.parametrize("layout", ["contiguous", "random_gaps"])
def test_resident_equals_carry_lock(layout):
    """The capture-resident lock scan (no sliding carry buffer; kernels
    read the padded capture in place) decodes the same frames as the
    chunked-carry path, and its returned carry materializes the same
    sliding buffer so checkpoint/resume stays compatible."""
    from anet.stream import _receive_stream_resident

    rng = np.random.default_rng(0x7E5 + hash(layout) % 1000)
    b, n_frames = 3, 5
    payloads = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
    if layout == "contiguous":
        gaps = [[450] + [0] * (n_frames - 1) for _ in range(b)]
    else:
        gaps = [
            [int(g) for g in rng.integers(0, 3 * CHUNK, n_frames)]
            for _ in range(b)
        ]
    cap = _build_capture(rng, gaps, payloads).astype(jnp.bfloat16)
    r0 = receive_stream(CFG, cap, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16)
    r1 = _receive_stream_resident(
        CFG, cap, CHUNK, PAY, 0.45, jnp.bfloat16, None, interpret=True
    )
    _assert_equal_results(r0, r1, b * n_frames)
    np.testing.assert_array_equal(
        np.asarray(r0.carry.buffer, np.float32),
        np.asarray(r1.carry.buffer, np.float32),
    )
    for f in ("samples_seen", "last_frame_end", "frames_detected", "locked",
              "next_start"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r0.carry, f)), np.asarray(getattr(r1.carry, f))
        )


def test_lock_unlocks_on_stream_end_and_reacquires():
    rng = np.random.default_rng(11)
    payloads = rng.integers(0, 256, (1, 4, PAY), dtype=np.uint8)
    # two frames, long silence (> frame + chunk), two frames
    gaps = [[600, 0, 5 * CHUNK, 0]]
    cap = _build_capture(rng, gaps, payloads)
    r0 = receive_stream(CFG, cap, CHUNK, PAY, lock=False)
    r1 = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
    _assert_equal_results(r0, r1, 4)


def test_lock_checkpoint_roundtrip(tmp_path):
    from anet.stream import load_carry, save_carry

    rng = np.random.default_rng(21)
    payloads = rng.integers(0, 256, (2, 4, PAY), dtype=np.uint8)
    gaps = [[300, 0, 0, 0], [1200, 5, 0, 2]]
    cap = _build_capture(rng, gaps, payloads)
    n = cap.shape[-1]
    half = (n // (2 * CHUNK)) * CHUNK
    # one-shot reference
    ref = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
    # two halves through a checkpoint file
    r_a = receive_stream(CFG, cap[:, :half], CHUNK, PAY, lock=True)
    path = tmp_path / "lock_ckpt.npz"
    save_carry(path, r_a.carry)
    resumed = load_carry(path)
    assert bool(jnp.array_equal(resumed.carry.locked, r_a.carry.locked))
    assert bool(jnp.array_equal(resumed.carry.next_start, r_a.carry.next_start))
    r_b = receive_stream(
        CFG, cap[:, half:], CHUNK, PAY, carry=resumed.carry, lock=True
    )
    assert int(r_a.carry.frames_ok.sum() + 0) + int(
        r_b.carry.frames_ok.sum() - r_a.carry.frames_ok.sum()
    ) == int(ref.carry.frames_ok.sum())
    assert bool(jnp.array_equal(r_b.carry.frames_ok, ref.carry.frames_ok))
    assert bool(jnp.array_equal(r_b.carry.last_frame_end, ref.carry.last_frame_end))


def test_load_carry_defaults_lock_fields(tmp_path):
    """Checkpoints written before the lock fields existed still load (the
    stream resumes unlocked and re-acquires by search)."""
    import numpy as onp

    carry = init_carry(CFG, CHUNK, PAY, (2,))
    fields = {k: onp.asarray(v) for k, v in carry._asdict().items()}
    del fields["locked"], fields["next_start"]
    fields["buffer_dtype"] = onp.asarray(str(carry.buffer.dtype))
    fields["buffer"] = onp.asarray(carry.buffer.astype(jnp.float32))
    fields["pending"] = onp.zeros(0, onp.float32)
    path = tmp_path / "old_ckpt.npz"
    onp.savez_compressed(path, **fields)
    from anet.stream import load_carry

    ck = load_carry(path)
    assert not bool(ck.carry.locked.any())
    assert ck.carry.next_start.shape == (2,)


def test_probe_quality_golden_properties():
    """The probe peaks at the true start lag and scores ~1 on a clean
    preamble; quality at pure noise stays far below threshold."""
    rng = np.random.default_rng(2)
    tmpl = preamble_waveform(CFG)
    k = tmpl.shape[-1]
    te = float(jnp.sum(tmpl * tmpl))
    length = 4 * k + 512
    sig = np.zeros((3, length), np.float32)
    pos = [100, 101, 2048 + 37]
    t_np = np.asarray(tmpl, np.float32)
    for i, p in enumerate(pos):
        sig[i, p : p + k] = t_np
    sig += 0.02 * rng.standard_normal(sig.shape).astype(np.float32)
    q, st0 = preamble_quality_probe(
        jnp.asarray(sig), jnp.asarray(pos, jnp.int32), tmpl, te
    )
    q = np.asarray(q)
    assert (np.argmax(q, -1) == 2).all()  # center lag wins
    assert (q.max(-1) > 0.95).all()
    qn, _ = preamble_quality_probe(
        jnp.asarray(rng.standard_normal((2, length)).astype(np.float32)),
        jnp.asarray([500, 900], jnp.int32),
        tmpl,
        te,
    )
    assert float(np.asarray(qn).max()) < 0.2


def test_probe_at_fused_golden_properties():
    """The span-DMA probe kernel (interpret): peaks at the true lag with
    ~1 quality on a clean preamble, stays far below threshold on noise,
    and its correlation half matches the jnp probe exactly (the window
    energy differs only by the documented st0- vs row-aligned superset)."""
    from anet.kernels import probe_at_fused

    rng = np.random.default_rng(17)
    tmpl = preamble_waveform(CFG)
    k = tmpl.shape[-1]
    te = float(jnp.sum(tmpl * tmpl))
    length = 4 * k + 512
    sig = np.zeros((3, length), np.float32)
    pos = [100, 101, 2048 + 37]
    t_np = np.asarray(tmpl, np.float32)
    for i, p in enumerate(pos):
        sig[i, p : p + k] = t_np
    sig += 0.02 * rng.standard_normal(sig.shape).astype(np.float32)
    st0 = jnp.asarray([p - 2 for p in pos], jnp.int32)
    q = np.asarray(
        probe_at_fused(jnp.asarray(sig), st0, tmpl, te, interpret=True)
    )
    assert q.shape == (3, 5)
    assert (np.argmax(q, -1) == 2).all()
    assert (q.max(-1) > 0.95).all()
    qn = np.asarray(
        probe_at_fused(
            jnp.asarray(rng.standard_normal((2, length)).astype(np.float32)),
            jnp.asarray([500, 900], jnp.int32),
            tmpl,
            te,
            interpret=True,
        )
    )
    assert float(qn.max()) < 0.2


def test_lock_stream_probe_kernel_agrees_with_golden(interpret_tpu_kernels):
    """Lock-mode streaming through the span-DMA probe kernel (interpret)
    decodes the same frames as the CPU jnp-probe path across layouts."""

    rng = np.random.default_rng(0xBEE)
    b, n_frames = 2, 4
    payloads = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
    gaps = [[450] + [0] * (n_frames - 1), [900, 2, 6000, 1]]
    cap = _build_capture(rng, gaps, payloads).astype(jnp.bfloat16)
    ref = receive_stream(CFG, cap, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16)

    interpret_tpu_kernels()
    got = receive_stream(
        CFG, cap, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16,
        resident=False,
    )
    _assert_equal_results(ref, got, b * n_frames)
    np.testing.assert_array_equal(
        np.asarray(ref.steps.frame_start), np.asarray(got.steps.frame_start)
    )


def test_lock_stream_ofdm_probe_kernel_agrees_with_golden(interpret_tpu_kernels):
    """OFDM lock-mode streaming through the TPU dispatch branches
    (span-DMA probe + block-maxima search, interpret) decodes the same
    frames as the CPU jnp path — the bench's stream:ofdm-fast entry runs
    exactly this combination on the chip."""
    ocfg = get_model("ofdm-fast").config
    pay = 256
    t_frame = family.frame_samples(ocfg, pay)
    chunk = t_frame // 128 * 128  # the bench default (lane-aligned)
    rng = np.random.default_rng(41)
    tx = jax.jit(family.transmit_fn(ocfg))
    n_frames = 3
    payloads = rng.integers(0, 256, (2, n_frames, pay), dtype=np.uint8)
    waves = np.asarray(tx(jnp.asarray(payloads.reshape(2 * n_frames, pay))))
    waves = waves.reshape(2, n_frames, t_frame)
    caps = []
    for s in range(2):
        sig = [np.zeros(500, np.float32)]
        for i in range(n_frames):
            sig.append(waves[s, i])
        caps.append(np.concatenate(sig))
    length = -(-(max(len(c) for c in caps) + t_frame + chunk) // chunk) * chunk
    cap = np.zeros((2, length), np.float32)
    for s, c in enumerate(caps):
        cap[s, : len(c)] = c
    cap += 0.01 * rng.standard_normal(cap.shape).astype(np.float32)
    capj = jnp.asarray(cap).astype(jnp.bfloat16)
    ref = receive_stream(ocfg, capj, chunk, pay, lock=True, compute_dtype=jnp.bfloat16)

    interpret_tpu_kernels()
    got = receive_stream(ocfg, capj, chunk, pay, lock=True, compute_dtype=jnp.bfloat16)
    _assert_equal_results(ref, got, 2 * n_frames)


def test_demod_probe_fused_row_boundary_residues():
    """demod_probe_fused (interpret) at st0 residues 122..127 and 0..2:
    the servo window [lo0, lo0 + n_lags) crosses the 128-lane row
    boundary for lo0 > 123. The probe must find the planted preamble at
    its true lag (off == 2 when the frame starts at st0 + 2) with ~1
    normalized quality — pre-fix, residues 124..127 masked the upper
    lags out entirely (at 126-127 the true lag itself), so off came out
    0 and the quality negative."""
    from anet.dsp.frame import data_symbols_for_payload
    from anet.kernels import demod_probe_fused

    rng = np.random.default_rng(3)
    tx = jax.jit(family.transmit_fn(CFG))
    tmpl = preamble_waveform(CFG)
    te = float(jnp.sum(tmpl * tmpl))
    n_symbols = data_symbols_for_payload(CFG, PAY)
    starts = [124, 125, 126, 127, 128, 129, 0 + 256, 1 + 256, 2 + 256, 64 + 256]
    b = len(starts)
    pays = rng.integers(0, 256, (b, PAY), dtype=np.uint8)
    waves = np.asarray(tx(jnp.asarray(pays)), np.float32)
    length = -(-(max(starts) + T_FRAME + 2048) // 128) * 128
    sig = np.zeros((b, length), np.float32)
    for i, p in enumerate(starts):
        sig[i, p : p + T_FRAME] = waves[i]
    sig += 0.01 * rng.standard_normal(sig.shape).astype(np.float32)
    buf = jnp.asarray(sig).astype(jnp.bfloat16)
    st0 = jnp.asarray([p - 2 for p in starts], jnp.int32)  # lo0 = start-2
    cmax, off, energy, tone, best, total = demod_probe_fused(
        CFG, buf, st0, n_symbols, tmpl.astype(jnp.bfloat16),
        start_bound=max(starts), interpret=True,
    )
    q = np.asarray(cmax) / np.sqrt(
        te * np.maximum(np.asarray(energy), 1e-4 * te)
    )
    assert (np.asarray(off) == 2).all(), np.asarray(off)
    assert (q > 0.9).all(), q
    # and the demod at st0 + off decodes the planted frames
    from anet.dsp.frame import frame_result_from_tone_decisions

    fr = frame_result_from_tone_decisions(CFG, tone, best, total, PAY)
    assert bool(np.asarray(fr.ok).all())
    assert np.array_equal(np.asarray(fr.payload), pays)


def test_lock_merged_kernel_row_boundary_residues(interpret_tpu_kernels):
    """Merged probe+demod kernel at frame-start residues that push the
    ±2-sample servo window across the 128-lane row boundary.

    t_frame % 128 == 0 here, so a stream's start residue is persistent
    for back-to-back frames. For starts at residues {124..127, 0, 1, 2}
    mod 128 the probe base st0 = start - 2 lands at lo0 in {122..127,
    0}; lo0 > 123 used to truncate the servo window to the base row's
    lags alone — at residues 126-127 the prediction itself was never
    probed, silently degrading every chunk to full search or anchoring
    the lock 1-2 samples early (round-4 ADVICE medium). The fixed kernel
    must decode identically to the CPU jnp lock path, with identical
    frame starts and every prediction probe-validated."""
    rng = np.random.default_rng(0x7E5)
    n_frames = 4
    gaps = []
    for g in (124, 125, 126, 127, 0, 1, 2):
        gaps.append([g] + [0] * (n_frames - 1))
    b = len(gaps)
    payloads = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
    cap = _build_capture(rng, gaps, payloads, noise=0.02).astype(jnp.bfloat16)
    ref = receive_stream(CFG, cap, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16)

    interpret_tpu_kernels()
    got = receive_stream(
        CFG, cap, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16,
        resident=False,
    )
    _assert_equal_results(ref, got, b * n_frames)
    np.testing.assert_array_equal(
        np.asarray(ref.steps.frame_start), np.asarray(got.steps.frame_start)
    )
    # every frame decoded exactly once (streams unlock at the noise tail
    # after the last frame, as in test_lock_unlocks_on_stream_end; the
    # probe-failure symptom itself is pinned by the direct kernel test
    # above)
    assert int(np.asarray(got.carry.frames_detected).sum()) == b * n_frames
    assert int(np.asarray(got.carry.decode_errors).sum()) == 0


def _build_dynamic_capture(rng, gaps_per_stream, lens_per_stream, chunk,
                           max_payload, noise=0.02):
    """Mixed-length capture: per-stream frames of varying payload length
    with per-frame leading gaps (0 = back-to-back)."""
    from anet.dsp.pipeline import transmit

    t_max = family.frame_samples(CFG, max_payload)
    caps, pays = [], []
    for gaps, lens in zip(gaps_per_stream, lens_per_stream):
        sig, ps = [], []
        for gap, n in zip(gaps, lens):
            p = rng.integers(0, 256, n, np.uint8)
            ps.append(p)
            sig.append(np.zeros(gap, np.float32))
            sig.append(np.asarray(transmit(CFG, jnp.asarray(p))))
        caps.append(np.concatenate(sig))
        pays.append(ps)
    length = max(len(c) for c in caps) + t_max + chunk
    length = -(-length // chunk) * chunk
    out = np.zeros((len(caps), length), np.float32)
    for s, c in enumerate(caps):
        out[s, : len(c)] = c
    out += noise * rng.standard_normal(out.shape).astype(np.float32)
    return jnp.asarray(out), pays


def _assert_equal_dynamic(r_search, r_lock, want_ok):
    det0 = np.asarray(r_search.steps.detected)
    det1 = np.asarray(r_lock.steps.detected)
    assert (det0 == det1).all()
    for f in ("payload", "payload_len"):
        a = np.asarray(getattr(r_search.steps.frame, f))[det0]
        b = np.asarray(getattr(r_lock.steps.frame, f))[det1]
        assert np.array_equal(a, b)
    assert int(r_search.carry.frames_ok.sum()) == want_ok
    assert int(r_lock.carry.frames_ok.sum()) == want_ok
    assert int(r_lock.carry.decode_errors.sum()) == int(
        r_search.carry.decode_errors.sum()
    )


@pytest.mark.parametrize("layout", ["contiguous", "random_gaps"])
def test_dynamic_lock_equals_search(layout):
    """Dynamic frame-lock: the header-declared length predicts the next
    start exactly (the varint length-prefix trust of network.cpp:409-430),
    so mixed-length back-to-back frames decode identically to search mode."""
    from anet.stream import receive_stream_dynamic

    rng = np.random.default_rng(hash(layout) % 2**31)
    chunk = 2048
    max_pay = 64  # t(16 B) = 4608 > chunk: one completion per chunk
    b, n_frames = 2, 4
    lens = [
        [int(v) for v in rng.choice([16, 32, 64], n_frames)] for _ in range(b)
    ]
    if layout == "contiguous":
        gaps = [[650] + [0] * (n_frames - 1) for _ in range(b)]
    else:
        gaps = [
            [int(g) for g in rng.integers(0, 2 * chunk, n_frames)]
            for _ in range(b)
        ]
    cap, _ = _build_dynamic_capture(rng, gaps, lens, chunk, max_pay)
    r0 = receive_stream_dynamic(CFG, cap, chunk, max_pay, lock=False)
    r1 = receive_stream_dynamic(CFG, cap, chunk, max_pay, lock=True)
    _assert_equal_dynamic(r0, r1, b * n_frames)


def test_dynamic_lock_fuzz_random_layouts():
    from anet.stream import receive_stream_dynamic

    rng = np.random.default_rng(0xD15)
    chunk = 2048
    max_pay = 64
    for _trial in range(4):
        b = int(rng.integers(1, 3))
        n_frames = int(rng.integers(1, 5))
        lens = [
            [int(v) for v in rng.choice([16, 24, 48, 64], n_frames)]
            for _ in range(b)
        ]
        gaps = [
            [int(g)] + [int(x) for x in rng.integers(0, 2, n_frames - 1) * rng.integers(0, 2 * chunk, n_frames - 1)]
            for g in rng.integers(200, 2 * chunk, b)
        ]
        cap, _ = _build_dynamic_capture(
            rng, gaps, lens, chunk, max_pay, noise=float(rng.uniform(0, 0.08))
        )
        r0 = receive_stream_dynamic(CFG, cap, chunk, max_pay, lock=False)
        r1 = receive_stream_dynamic(CFG, cap, chunk, max_pay, lock=True)
        _assert_equal_dynamic(r0, r1, b * n_frames)


def test_dynamic_lock_engages_and_skips_search():
    """Back-to-back mixed-length frames: after acquisition the prediction
    carries the stream — locked non-detection chunks report the 0.0
    search-skipped sentinel."""
    from anet.stream import receive_stream_dynamic

    rng = np.random.default_rng(77)
    chunk = 2048
    max_pay = 64
    lens = [[64, 16, 32, 64, 16, 48]]
    gaps = [[700] + [0] * 5]
    cap, _ = _build_dynamic_capture(rng, gaps, lens, chunk, max_pay, noise=0.0)
    r = receive_stream_dynamic(CFG, cap, chunk, max_pay, lock=True)
    det = np.asarray(r.steps.detected)[:, 0]
    q = np.asarray(r.steps.quality)[:, 0]
    assert int(r.carry.frames_ok[0]) == 6
    first = int(np.argmax(det))
    last = len(det) - 1 - int(np.argmax(det[::-1]))
    mid = ~det[first:last]
    assert (q[first:last][mid] == 0.0).all()
    assert (q[det] > 0.9).all()
    got_lens = np.asarray(r.steps.frame.payload_len)[:, 0][det].tolist()
    assert got_lens == lens[0]


def test_dynamic_lock_rejects_multi_candidate():
    from anet.stream import receive_stream_dynamic

    cap = jnp.zeros((1, 4096))
    with pytest.raises(ValueError, match="max_frames_per_chunk"):
        receive_stream_dynamic(
            CFG, cap, 1024, 64, lock=True, max_frames_per_chunk=2
        )


def test_lock_ofdm_equals_search():
    """Frame-lock is family-generic: the probe/search/demod plumbing works
    for OFDM frames too (the bench's stream:ofdm-fast entry runs lock)."""
    ocfg = get_model("ofdm-fast").config
    pay = 256  # t_frame 4800 > chunk (the one-candidate-per-chunk contract)
    t_frame = family.frame_samples(ocfg, pay)
    chunk = 4096
    rng = np.random.default_rng(31)
    tx = jax.jit(family.transmit_fn(ocfg))
    n_frames = 4
    payloads = rng.integers(0, 256, (2, n_frames, pay), dtype=np.uint8)
    waves = np.asarray(tx(jnp.asarray(payloads.reshape(2 * n_frames, pay))))
    waves = waves.reshape(2, n_frames, t_frame)
    caps = []
    for s in range(2):
        sig = [np.zeros(500, np.float32)]
        for i in range(n_frames):
            sig.append(waves[s, i])
        caps.append(np.concatenate(sig))
    length = -(-(max(len(c) for c in caps) + t_frame + chunk) // chunk) * chunk
    cap = np.zeros((2, length), np.float32)
    for s, c in enumerate(caps):
        cap[s, : len(c)] = c
    cap += 0.01 * rng.standard_normal(cap.shape).astype(np.float32)
    capj = jnp.asarray(cap)
    r0 = receive_stream(ocfg, capj, chunk, pay, lock=False)
    r1 = receive_stream(ocfg, capj, chunk, pay, lock=True)
    _assert_equal_results(r0, r1, 2 * n_frames)
