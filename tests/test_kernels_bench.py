"""Pallas kernel numerics (interpret mode on CPU) + driver entry points."""

import numpy as np
import jax
import jax.numpy as jnp

from anet.dsp import ModemConfig
from anet.dsp.demod import tone_energies
from anet.dsp.mod import modulate_symbols
from anet.kernels import tone_energies_fused

CFG = ModemConfig()


def _noisy_wave(shape_syms, seed=0):
    rng = np.random.default_rng(seed)
    syms = jnp.asarray(rng.integers(0, CFG.num_tones, shape_syms))
    wave = modulate_symbols(CFG, syms)
    noise = 0.05 * rng.normal(size=wave.shape).astype(np.float32)
    return syms, wave + jnp.asarray(noise)


def test_fused_energies_match_golden():
    _, wave = _noisy_wave((3, 257))  # odd symbol count exercises tile padding
    ref = tone_energies(CFG, wave)
    out = tone_energies_fused(CFG, wave, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_fused_energies_bf16_decisions_match():
    from anet.dsp.demod import decide_symbols

    syms, wave = _noisy_wave((600,), seed=1)
    e = tone_energies_fused(CFG, wave, compute_dtype=jnp.bfloat16, interpret=True)
    assert np.array_equal(np.asarray(decide_symbols(CFG, e)), np.asarray(syms))


def test_frame_demod_use_pallas_flag():
    from anet.dsp.frame import demodulate_frame
    from anet.dsp.pipeline import transmit

    payload = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, 48, dtype=np.uint8)
    )
    wave = transmit(CFG, payload)
    # interpret-mode pallas path end to end through the frame parser
    import anet.kernels as K
    import functools

    orig = K.tone_energies_fused
    K.tone_energies_fused = functools.partial(orig, interpret=True)
    try:
        res = demodulate_frame(CFG, wave, 48, use_pallas=True)
    finally:
        K.tone_energies_fused = orig
    assert bool(res.ok)
    assert np.array_equal(np.asarray(res.payload), np.asarray(payload))


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert bool(out.ok.all())


def test_graft_entry_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_decide_tones_fused_interpret():
    from anet.kernels import decide_tones_fused

    rng = np.random.default_rng(3)
    syms, = (jnp.asarray(rng.integers(0, CFG.num_tones, (2, 300))),)
    wave = modulate_symbols(CFG, syms) + jnp.asarray(
        0.03 * rng.normal(size=(2, 300 * CFG.samples_per_symbol)).astype(np.float32)
    )
    tones, best, total = decide_tones_fused(CFG, wave, interpret=True)
    from anet.dsp.bits import gray_encode

    assert np.array_equal(np.asarray(tones), np.asarray(gray_encode(syms)))
    assert np.all(np.asarray(best) <= np.asarray(total) + 1e-3)


def test_decide_tones_tm_interpret():
    """Time-major fused kernel (interpret) matches the jnp filterbank,
    including symbol-tile and lane padding (odd S, B not a lane multiple)."""
    from anet.kernels import decide_tones_tm

    rng = np.random.default_rng(4)
    B, S = 5, 27  # S % 8 != 0, B % 128 != 0 — both pad paths
    syms = jnp.asarray(rng.integers(0, CFG.num_tones, (B, S)))
    wave = modulate_symbols(CFG, syms) + jnp.asarray(
        0.05 * rng.normal(size=(B, S * CFG.samples_per_symbol)).astype(np.float32)
    )
    e = tone_energies(CFG, wave)  # [B, S, M]
    tone, best, total = decide_tones_tm(
        CFG, wave.T, compute_dtype=jnp.float32, interpret=True
    )
    assert np.array_equal(np.asarray(tone.T), np.asarray(jnp.argmax(e, axis=-1)))
    np.testing.assert_allclose(
        np.asarray(best.T), np.asarray(jnp.max(e, axis=-1)), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(total.T), np.asarray(jnp.sum(e, axis=-1)), rtol=1e-5, atol=1e-4
    )


def test_demodulate_frame_tm_matches_batch_major():
    """The time-major frame demodulator (jnp and interpret-kernel paths)
    produces byte-identical results to demodulate_frame."""
    from anet.channel import awgn
    from anet.dsp.frame import demodulate_frame, demodulate_frame_tm, modulate_frame

    rng = np.random.default_rng(5)
    p = jnp.asarray(rng.integers(0, 256, (4, 96), np.uint8))
    noisy = awgn(jax.random.PRNGKey(3), modulate_frame(CFG, p), 8.0)
    r_bm = demodulate_frame(CFG, noisy, 96)
    r_tm = demodulate_frame_tm(
        CFG, noisy.T, 96, compute_dtype=jnp.float32, use_pallas=False
    )
    r_tk = demodulate_frame_tm(
        CFG, noisy.T, 96, compute_dtype=jnp.float32, use_pallas=True, interpret=True
    )
    for r in (r_tm, r_tk):
        assert np.array_equal(np.asarray(r.payload), np.asarray(r_bm.payload))
        assert np.array_equal(np.asarray(r.ok), np.asarray(r_bm.ok))
        np.testing.assert_allclose(
            np.asarray(r.snr_db), np.asarray(r_bm.snr_db), rtol=1e-4
        )


def test_demodulate_frame_tm_coded():
    """Coded configs route through the jnp tm path with transposed LLRs."""
    import dataclasses

    from anet.channel import awgn
    from anet.dsp.frame import demodulate_frame, demodulate_frame_tm, modulate_frame

    cfg = dataclasses.replace(CFG, fec="conv", fec_interleave=16)
    rng = np.random.default_rng(6)
    p = jnp.asarray(rng.integers(0, 256, (3, 48), np.uint8))
    noisy = awgn(jax.random.PRNGKey(4), modulate_frame(cfg, p), 2.0)
    r_bm = demodulate_frame(cfg, noisy, 48)
    r_tm = demodulate_frame_tm(cfg, noisy.T, 48, compute_dtype=jnp.float32)
    assert np.array_equal(np.asarray(r_tm.payload), np.asarray(r_bm.payload))
    assert np.array_equal(np.asarray(r_tm.ok), np.asarray(r_bm.ok))


def test_cli_modem_stream_rx(tmp_path, capsys):
    """Multi-frame capture through the streaming CLI."""
    import jax.numpy as jnp

    from anet.cli import main
    from anet.channel import awgn
    from anet.dsp.pipeline import transmit as mfsk_tx
    from anet.models import get_model

    cfg = get_model("mfsk4-coded").config
    rng = np.random.default_rng(4)
    chunks = [rng.integers(0, 256, 40, np.uint8) for _ in range(2)]
    parts = [np.zeros(500, np.float32)]
    for c in chunks:
        parts += [np.asarray(mfsk_tx(cfg, jnp.asarray(c))), np.zeros(700, np.float32)]
    cap = awgn(jax.random.PRNGKey(0), jnp.asarray(np.concatenate(parts)), 4.0)
    path = tmp_path / "cap.f32"
    np.asarray(cap, np.float32).tofile(path)
    out = tmp_path / "payloads.bin"
    rc = main([
        "modem-stream-rx", str(path), "--len", "40",
        "--model", "mfsk4-coded", "--out", str(out),
    ])
    assert rc == 0
    assert out.read_bytes() == b"".join(c.tobytes() for c in chunks)
    assert "2 ok" in capsys.readouterr().out


def test_correlate_fused_matches_direct():
    """The fused Pallas correlator (interpret) matches the direct sliding
    window formulation, including lag-tile and stream padding."""
    from anet.dsp.sync import correlate_template
    from anet.kernels import correlate_fused

    rng = np.random.default_rng(12)
    for B, N, K, OL in [(3, 5000, 2048, 2048), (2, 2600, 513, 2048), (1, 4096, 100, 3500)]:
        seg = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(K,)), jnp.float32)
        ref = correlate_template(seg, t, method="direct")[..., :OL]
        got = correlate_fused(seg, t, OL, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-3
        )


def test_sync_search_fused_matches_blockwise():
    """The fused sync search (interpret) returns exactly the max/argmax of
    the materializing correlate + blockwise_match_quality path, in both
    f32 and bf16, across template/cell-geometry edge cases."""
    from anet.dsp.sync import blockwise_match_quality, correlate_template
    from anet.kernels import sync_search_fused

    rng = np.random.default_rng(7)
    cases = [
        (4, 4096, 2048, jnp.float32),
        (3, 8192, 2048, jnp.bfloat16),
        (2, 512, 300, jnp.float32),
        (5, 4096, 700, jnp.bfloat16),
    ]
    for B, OL, K, dtype in cases:
        tmpl = jnp.asarray(rng.normal(size=K), jnp.float32).astype(dtype)
        seg = jnp.asarray(rng.normal(size=(B, OL + K - 1)), jnp.float32).astype(dtype)
        te = jnp.sum(tmpl.astype(jnp.float32) ** 2)
        corr = correlate_template(seg, tmpl, method="matmul")
        q = blockwise_match_quality(seg, corr, K, te)
        got_q, got_i = sync_search_fused(seg, tmpl, OL, te, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(q.argmax(-1)))
        np.testing.assert_allclose(
            np.asarray(got_q), np.asarray(q.max(-1)), rtol=2e-4, atol=1e-5
        )


def test_stream_fused_search_agrees_with_quality_path(interpret_tpu_kernels):
    """The _search_best fast path (block-maxima kernel + probe refine,
    interpret) nominates the same candidates as the materializing quality
    path on a real frame."""
    import anet.stream as S
    from anet.dsp import family

    cfg = CFG
    payload_len = 32
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = 1024
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 256, (2, payload_len), dtype=np.uint8))
    wave = family.transmit_fn(cfg)(payload)
    total = -(-(t_frame + 700) // chunk) * chunk
    cap = np.zeros((2, total), np.float32)
    cap[:, 700 : 700 + t_frame] = np.asarray(wave)
    cap += rng.normal(scale=0.02, size=cap.shape).astype(np.float32)
    capture = jnp.asarray(cap)

    ref = S.receive_stream(cfg, capture, chunk, payload_len)

    interpret_tpu_kernels()  # TPU dispatch branches via interpret kernels
    got = S.receive_stream(cfg, capture, chunk, payload_len)
    assert int(got.carry.frames_ok.sum()) == int(ref.carry.frames_ok.sum()) == 2
    np.testing.assert_array_equal(
        np.asarray(got.steps.detected), np.asarray(ref.steps.detected)
    )
    np.testing.assert_array_equal(
        np.asarray(got.steps.frame_start), np.asarray(ref.steps.frame_start)
    )


def test_demod_at_fused_matches_gather_demod():
    """The fused align+demod kernel (interpret) reproduces the unfused
    aligned_gather -> tone_energies decisions exactly, in f32 and bf16,
    at random frame starts inside a streaming buffer."""
    from anet.dsp.sync import aligned_gather
    from anet.kernels import demod_at_fused

    rng = np.random.default_rng(0)
    sps, pre = CFG.samples_per_symbol, CFG.preamble_symbols
    for S, dtype in [(536, jnp.float32), (536, jnp.bfloat16), (7, jnp.bfloat16)]:
        t_frame = (pre + S) * sps
        B, chunk = 6, 4096
        buf = jnp.asarray(
            rng.normal(size=(B, t_frame + chunk)).astype(np.float32)
        ).astype(dtype)
        starts = jnp.asarray(rng.integers(0, chunk, B), jnp.int32)
        aligned = aligned_gather(buf, starts, t_frame).astype(dtype)
        e = tone_energies(CFG, aligned[..., pre * sps :], compute_dtype=dtype)
        gt, gb, gtot = demod_at_fused(CFG, buf, starts, S, interpret=True)
        np.testing.assert_array_equal(np.asarray(gt), np.asarray(e.argmax(-1)))
        scale = float(np.abs(np.asarray(e.max(-1))).max())
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(e.max(-1)), atol=1e-5 * scale
        )
        np.testing.assert_allclose(
            np.asarray(gtot), np.asarray(e.sum(-1)), atol=1e-4 * scale
        )


def test_demod_at_energies_fused_matches_tone_energies():
    """The energies twin (full filterbank out, for soft-FEC consumers)
    reproduces aligned_gather -> tone_energies, f32 and bf16."""
    from anet.dsp.sync import aligned_gather
    from anet.kernels import demod_at_energies_fused

    rng = np.random.default_rng(1)
    sps, pre = CFG.samples_per_symbol, CFG.preamble_symbols
    for S, dtype in [(536, jnp.float32), (536, jnp.bfloat16), (7, jnp.bfloat16)]:
        t_frame = (pre + S) * sps
        B, chunk = 6, 4096
        buf = jnp.asarray(
            rng.normal(size=(B, t_frame + chunk)).astype(np.float32)
        ).astype(dtype)
        starts = jnp.asarray(rng.integers(0, chunk, B), jnp.int32)
        aligned = aligned_gather(buf, starts, t_frame).astype(dtype)
        e = tone_energies(CFG, aligned[..., pre * sps :], compute_dtype=dtype)
        got = demod_at_energies_fused(CFG, buf, starts, S, interpret=True)
        assert got.shape == e.shape
        scale = float(np.abs(np.asarray(e)).max())
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(e), atol=1e-5 * scale
        )


def test_decide_frame_tm_full_fusion_matches_golden():
    """The full-fusion kernel (decide_frame_tm: packed words + in-kernel
    CRC accumulators + quality sums, interpret) reproduces the jnp
    time-major parse across tone counts (bps 1/2/4), payload lengths, and
    corrupted frames — payload and every verdict bit-exact, quality
    metrics to f32 sum-order tolerance."""
    from anet.dsp import family
    from anet.dsp.frame import demodulate_frame_tm, frame_result_from_packed
    from anet.kernels import decide_frame_tm
    from anet.models import get_model

    rng = np.random.default_rng(21)
    for model, pay in [
        ("fsk2-robust", 17),
        ("mfsk4-voice", 32),
        ("mfsk16-fast", 96),
    ]:
        cfg = get_model(model).config
        B = 5
        payloads = jnp.asarray(rng.integers(0, 256, (B, pay), dtype=np.uint8))
        waves = np.array(family.transmit_fn(cfg)(payloads), np.float32)
        waves += 0.05 * rng.standard_normal(waves.shape).astype(np.float32)
        # corrupt one stream's payload region hard (bad CRC, good header)
        waves[B - 1, waves.shape[-1] // 2 :] = 0.0
        wtm = jnp.asarray(waves.T)
        ref = demodulate_frame_tm(cfg, wtm, pay, use_pallas=False)
        data = wtm[cfg.preamble_symbols * cfg.samples_per_symbol :, :]
        words, crc_counts, qual, n_sym = decide_frame_tm(
            cfg, data, pay, interpret=True
        )
        got = frame_result_from_packed(cfg, words, crc_counts, qual, n_sym, pay)
        for f in ("payload", "magic_ok", "length_ok", "header_crc_ok",
                  "payload_crc_ok", "ok"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
            )
        assert bool(got.ok[0]) and not bool(got.ok[B - 1])
        np.testing.assert_allclose(
            np.asarray(got.confidence), np.asarray(ref.confidence), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.snr_db), np.asarray(ref.snr_db), rtol=1e-3, atol=1e-3
        )


def test_decide_frame_tm_preamble_offset_zero_copy():
    """decide_frame_tm(preamble_offset=pre) on WHOLE frames — the
    zero-copy BlockSpec-offset form (both the true zero-copy branch,
    exact geometry, and the slice fallback) equals the pre-sliced call.
    Slicing in-jit instead fed the Pallas operand a materialized copy of
    the data section (~3.5 ms/iter at B=16384 — the round-5 headline
    bisection, tools/exp_ceiling5.py)."""
    from anet.dsp import family
    from anet.kernels import decide_frame_tm
    from anet.models import get_model

    rng = np.random.default_rng(77)
    cfg = get_model("mfsk16-fast").config
    pay = 256
    pre = cfg.preamble_symbols * cfg.samples_per_symbol
    for B in (16, 128):  # 16 -> b_pad fallback branch; 128 -> zero-copy
        payloads = jnp.asarray(rng.integers(0, 256, (B, pay), dtype=np.uint8))
        w = np.array(family.transmit_fn(cfg)(payloads), np.float32).T
        w += 0.02 * rng.standard_normal(w.shape).astype(np.float32)
        full = jnp.asarray(w).astype(jnp.bfloat16)
        got = decide_frame_tm(cfg, full, pay, interpret=True, preamble_offset=pre)
        ref = decide_frame_tm(cfg, full[pre:], pay, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]))
        np.testing.assert_allclose(
            np.asarray(got[2]), np.asarray(ref[2]), rtol=1e-5
        )


def test_decide_frame_tm_int8_ingest_matches_bf16():
    """The quantized-ingest variant (int8 capture x int8 basis ->
    int32 MXU, interpret): identical packed decisions, CRC verdicts and
    payloads vs the bf16 kernel at operating noise levels; conf/snr
    ratios agree to quantization tolerance (energies carry a uniform
    scale factor the ratios cancel)."""
    from anet.dsp import family
    from anet.dsp.frame import frame_result_from_packed
    from anet.kernels import decide_frame_tm
    from anet.models import get_model

    rng = np.random.default_rng(55)
    cfg = get_model("mfsk16-fast").config
    pay = 96
    B = 6
    payloads = jnp.asarray(rng.integers(0, 256, (B, pay), dtype=np.uint8))
    waves = np.array(family.transmit_fn(cfg)(payloads), np.float32)
    waves += 0.05 * rng.standard_normal(waves.shape).astype(np.float32)
    data = waves[:, cfg.preamble_symbols * cfg.samples_per_symbol :].T
    scale = 127.0 / np.abs(data).max()
    d8 = jnp.asarray(np.round(data * scale).astype(np.int8))
    w8, crc8, q8, n_sym = decide_frame_tm(
        cfg, d8, pay, compute_dtype=jnp.int8, interpret=True
    )
    wb, crcb, qb, _ = decide_frame_tm(
        cfg, jnp.asarray(data).astype(jnp.bfloat16), pay, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(w8), np.asarray(wb))
    got = frame_result_from_packed(cfg, w8, crc8, q8, n_sym, pay)
    ref = frame_result_from_packed(cfg, wb, crcb, qb, n_sym, pay)
    for f in ("payload", "ok", "header_crc_ok", "payload_crc_ok"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
    assert bool(np.asarray(got.ok).all())
    np.testing.assert_allclose(
        np.asarray(got.confidence), np.asarray(ref.confidence), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got.snr_db), np.asarray(ref.snr_db), rtol=0.05
    )


def test_stream_dynamic_fused_demod_agrees_with_golden(interpret_tpu_kernels):
    """stream_step_dynamic's fused demod branch (demod_at_fused ->
    dynamic_frame_result_from_tone_decisions, interpret kernels) emits the
    same detections, payload lengths, and payloads as the CPU golden
    gather + demodulate_frame_dynamic path — in both search and lock mode."""
    import anet.stream as S
    from anet.dsp import family
    from anet.dsp.pipeline import transmit

    cfg = CFG
    max_pay = 64
    t_max = family.frame_samples(cfg, max_pay)
    chunk = 2048
    rng = np.random.default_rng(13)
    # two streams, mixed-length back-to-back frames
    caps, all_lens = [], [[16, 64, 32], [64, 24, 16]]
    for lens in all_lens:
        sig = [np.zeros(700, np.float32)]
        for n in lens:
            p = jnp.asarray(rng.integers(0, 256, n, np.uint8))
            sig.append(np.asarray(transmit(cfg, p)))
        caps.append(np.concatenate(sig))
    length = -(-(max(len(c) for c in caps) + t_max + chunk) // chunk) * chunk
    cap = np.zeros((2, length), np.float32)
    for s, c in enumerate(caps):
        cap[s, : len(c)] = c
    cap += 0.02 * rng.standard_normal(cap.shape).astype(np.float32)
    capture = jnp.asarray(cap)

    refs = {
        lock: S.receive_stream_dynamic(
            cfg, capture, chunk, max_pay, compute_dtype=jnp.bfloat16, lock=lock
        )
        for lock in (False, True)
    }

    interpret_tpu_kernels()
    for lock, ref in refs.items():
        got = S.receive_stream_dynamic(
            cfg, capture, chunk, max_pay, compute_dtype=jnp.bfloat16, lock=lock
        )
        assert int(got.carry.frames_ok.sum()) == int(ref.carry.frames_ok.sum()) == 6
        for field in ("detected", "frame_start"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got.steps, field)),
                np.asarray(getattr(ref.steps, field)),
            )
        for field in ("payload", "payload_len", "ok"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got.steps.frame, field)),
                np.asarray(getattr(ref.steps.frame, field)),
            )


def test_stream_fused_coded_demod_agrees_with_golden(interpret_tpu_kernels):
    """stream_step's fused CODED branch (demod_at_energies_fused ->
    bit_llrs -> Viterbi, interpret kernels) emits the same detections,
    payloads, and counters as the CPU golden gather+demod path — the
    robust-mode streaming fast path added in round 4."""
    import anet.stream as S
    from anet.dsp import family
    from anet.models import get_model

    cfg = get_model("mfsk4-coded").config
    payload_len = 32
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = 1024
    rng = np.random.default_rng(7)
    payload = jnp.asarray(rng.integers(0, 256, (2, payload_len), dtype=np.uint8))
    wave = family.transmit_fn(cfg)(payload)
    total = -(-(t_frame + 700) // chunk) * chunk
    cap = np.zeros((2, total), np.float32)
    cap[:, 700 : 700 + t_frame] = np.asarray(wave)
    cap += rng.normal(scale=0.02, size=cap.shape).astype(np.float32)
    capture = jnp.asarray(cap)

    ref = S.receive_stream(
        cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
    )

    interpret_tpu_kernels()
    got = S.receive_stream(
        cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
    )
    assert int(got.carry.frames_ok.sum()) == int(ref.carry.frames_ok.sum()) == 2
    for field in ("detected", "frame_start"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got.steps, field)),
            np.asarray(getattr(ref.steps, field)),
        )
    np.testing.assert_array_equal(
        np.asarray(got.steps.frame.payload), np.asarray(ref.steps.frame.payload)
    )
    np.testing.assert_array_equal(
        np.asarray(got.steps.frame.ok), np.asarray(ref.steps.frame.ok)
    )


def test_stream_fused_demod_agrees_with_golden(interpret_tpu_kernels):
    """stream_step's fused align+demod branch (interpret kernels) emits the
    same detections, payloads, and counters as the CPU golden path."""
    import anet.stream as S
    from anet.dsp import family

    cfg = CFG
    payload_len = 32
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = 1024
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 256, (2, payload_len), dtype=np.uint8))
    wave = family.transmit_fn(cfg)(payload)
    total = -(-(t_frame + 700) // chunk) * chunk
    cap = np.zeros((2, total), np.float32)
    cap[:, 700 : 700 + t_frame] = np.asarray(wave)
    cap += rng.normal(scale=0.02, size=cap.shape).astype(np.float32)
    capture = jnp.asarray(cap)

    ref = S.receive_stream(
        cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
    )

    interpret_tpu_kernels()
    got = S.receive_stream(
        cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
    )
    assert int(got.carry.frames_ok.sum()) == int(ref.carry.frames_ok.sum()) == 2
    for field in ("detected", "frame_start"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got.steps, field)),
            np.asarray(getattr(ref.steps, field)),
        )
    np.testing.assert_array_equal(
        np.asarray(got.steps.frame.payload), np.asarray(ref.steps.frame.payload)
    )
    np.testing.assert_array_equal(
        np.asarray(got.steps.frame.ok), np.asarray(ref.steps.frame.ok)
    )
