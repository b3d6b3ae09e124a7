"""Real-Mosaic validation of every Pallas kernel against its golden model.

CI runs on CPU, where the kernels are exercised in interpret mode only
(tests/). This tool runs the SAME equivalence checks through the real
Mosaic compiler on an attached TPU — the check interpret mode cannot
give you. Run it whenever a kernel changes:

    python tools/tpu_validate.py            # all checks, one PASS/FAIL line each

Exit code 0 iff every check passes. Each check is small (seconds of chip
time after compilation). The golden models are the jnp formulations the
kernels replaced; "equal" means bit-exact where the kernel is designed
to be (Viterbi, gather) and within fp tolerance where accumulation
order differs (filterbank, correlation).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

FAILURES = []


def check(name: str, fn) -> None:
    try:
        fn()
    except AssertionError as e:
        FAILURES.append(name)
        print(f"FAIL {name}: {e}")
    except Exception as e:  # noqa: BLE001 — report, keep going
        FAILURES.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {e}")
    else:
        print(f"PASS {name}")


def main() -> int:
    import jax

    from anet.utils.compilecache import enable as _cc

    _cc()  # persistent compile cache: warm re-runs through the tunnel
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("no TPU attached (default backend is cpu); nothing validated")
        return 1

    from anet.dsp import fec
    from anet.dsp.demod import tone_energies
    from anet.dsp.frame import demodulate_frame, demodulate_frame_tm, modulate_frame
    from anet.dsp.mod import modulate_symbols
    from anet.dsp.params import ModemConfig
    from anet.dsp.sync import (
        aligned_gather,
        blockwise_match_quality,
        correlate_template,
        normalized_match_quality,
        preamble_waveform,
        sliding_window_energy,
    )
    from anet.kernels import correlate_fused, decide_tones_tm, viterbi_trellis

    cfg = ModemConfig()
    rng = np.random.default_rng(0)

    def check_decide_tm():
        b, s = 96, 50
        syms = jnp.asarray(rng.integers(0, cfg.num_tones, (b, s)))
        wave = modulate_symbols(cfg, syms) + jnp.asarray(
            0.05 * rng.normal(size=(b, s * cfg.samples_per_symbol)).astype(np.float32)
        )
        e = tone_energies(cfg, wave)
        tone, best, total = decide_tones_tm(cfg, wave.T, compute_dtype=jnp.float32)
        assert np.array_equal(
            np.asarray(tone.T), np.asarray(jnp.argmax(e, axis=-1))
        ), "tone decisions differ"
        np.testing.assert_allclose(
            np.asarray(best.T), np.asarray(jnp.max(e, axis=-1)), rtol=1e-4, atol=1e-3
        )

    def check_frame_tm():
        p = jnp.asarray(rng.integers(0, 256, (8, 96), np.uint8))
        w = modulate_frame(cfg, p).astype(jnp.bfloat16)
        r_bm = demodulate_frame(cfg, w, 96, compute_dtype=jnp.bfloat16)
        r_tm = demodulate_frame_tm(cfg, w.T, 96, compute_dtype=jnp.bfloat16)
        assert np.array_equal(np.asarray(r_tm.payload), np.asarray(r_bm.payload))
        assert np.asarray(r_tm.ok).all(), "tm demod failed clean frames"

    def check_viterbi():
        nbits = 501
        data = jnp.asarray(rng.integers(0, 2, (37, nbits)), jnp.uint8)
        coded = fec.conv_encode(data)
        llrs = jnp.asarray(
            np.asarray(coded) * 2.0
            - 1.0
            + rng.normal(0, 0.4, coded.shape).astype(np.float32)
        )
        ref = fec.viterbi_decode_soft(llrs, nbits, use_pallas=False)
        got = fec.viterbi_decode_soft(llrs, nbits, use_pallas=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), (
            f"{int((np.asarray(ref) != np.asarray(got)).sum())} bits differ"
        )

    def check_correlator():
        tmpl = preamble_waveform(cfg).astype(jnp.bfloat16)
        k = tmpl.shape[-1]
        seg = jnp.asarray(
            rng.normal(size=(5, 4096 + k - 1)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = correlate_template(seg, tmpl, method="matmul")
        got = correlate_fused(seg, tmpl, 4096)
        scale = float(np.max(np.abs(np.asarray(ref)))) or 1.0
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(ref) / scale, atol=2e-2
        )

    def check_gather_onehot():
        n, size = 44544, 36352
        x = jnp.asarray(rng.normal(size=(512, n)), jnp.bfloat16)
        starts = jnp.asarray(rng.integers(0, n - size, 512), jnp.int32)
        a = aligned_gather(x, starts, size, jnp.bfloat16, mode="dma")
        b = aligned_gather(x, starts, size, jnp.bfloat16, mode="onehot")
        assert np.array_equal(np.asarray(a), np.asarray(b)), "gather modes differ"

    def check_blockwise_quality():
        tmpl = preamble_waveform(cfg)
        k = tmpl.shape[-1]
        seg = jnp.asarray(rng.normal(size=(4, 2048 + k - 1)), jnp.float32)
        corr = correlate_template(seg, tmpl, method="matmul")
        t_e = jnp.sum(tmpl * tmpl)
        exact = normalized_match_quality(corr, sliding_window_energy(seg, k), t_e)
        coarse = blockwise_match_quality(seg, corr, k, t_e)
        rel = np.abs(np.asarray(coarse) - np.asarray(exact)) / np.maximum(
            np.asarray(exact), 1e-3
        )
        assert float(rel.max()) < 0.08, f"quality deviates {rel.max():.3f}"

    def check_sync_search():
        from anet.kernels import sync_search_fused

        tmpl = preamble_waveform(cfg).astype(jnp.bfloat16)
        k = tmpl.shape[-1]
        out_len = 4096
        seg_np = rng.normal(scale=0.05, size=(6, out_len + k - 1)).astype(np.float32)
        # plant real preambles so the argmax rides a true peak, not noise
        for i, off in enumerate((0, 777, 2048, 4095, 100, 3000)):
            seg_np[i, off : off + k] += np.asarray(tmpl, np.float32)
        seg = jnp.asarray(seg_np).astype(jnp.bfloat16)
        t_e = jnp.sum(tmpl.astype(jnp.float32) ** 2)
        corr = correlate_template(seg, tmpl, method="matmul")[..., :out_len]
        qref = blockwise_match_quality(seg, corr, k, t_e)
        got_q, got_i = sync_search_fused(seg, tmpl, out_len, t_e)
        assert np.array_equal(
            np.asarray(got_i), np.asarray(jnp.argmax(qref, -1))
        ), "best lag differs"
        np.testing.assert_allclose(
            np.asarray(got_q), np.asarray(jnp.max(qref, -1)), rtol=5e-3, atol=5e-3
        )

    def check_demod_at():
        from anet.dsp.frame import data_symbols_for_payload
        from anet.kernels import demod_at_fused

        pay = 64
        s = data_symbols_for_payload(cfg, pay)
        t_frame = (cfg.preamble_symbols + s) * cfg.samples_per_symbol
        buf_np = rng.normal(scale=0.05, size=(16, t_frame + 2048)).astype(np.float32)
        starts = rng.integers(0, 2048 + 1, 16).astype(np.int32)
        starts[0] = 2048  # max-start edge
        p = jnp.asarray(rng.integers(0, 256, (16, pay), np.uint8))
        w = np.asarray(modulate_frame(cfg, p), np.float32)
        for i in range(16):
            buf_np[i, starts[i] : starts[i] + t_frame] += w[i]
        buf = jnp.asarray(buf_np).astype(jnp.bfloat16)
        st = jnp.asarray(starts)
        aligned = aligned_gather(buf, st, t_frame, jnp.bfloat16)
        e = tone_energies(
            cfg,
            aligned[..., cfg.preamble_symbols * cfg.samples_per_symbol :],
            compute_dtype=jnp.bfloat16,
        )
        tone, best, total = demod_at_fused(cfg, buf, st, s)
        assert np.array_equal(
            np.asarray(tone), np.asarray(jnp.argmax(e, -1))
        ), "tone decisions differ"
        scale = float(np.abs(np.asarray(e.max(-1))).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(best), np.asarray(e.max(-1)), atol=1e-2 * scale
        )

    def check_probe():
        from anet.dsp.sync import preamble_quality_probe

        tmpl = preamble_waveform(cfg).astype(jnp.bfloat16)
        k = tmpl.shape[-1]
        t_e = jnp.sum(tmpl.astype(jnp.float32) ** 2)
        length = 3 * k + 640
        buf_np = rng.normal(scale=0.05, size=(16, length)).astype(np.float32)
        starts = rng.integers(0, length - k - 300, 16).astype(np.int32)
        starts[:3] = (0, 1, 127)  # bottom-clip + lane edges
        for i in range(4, 16):
            buf_np[i, starts[i] : starts[i] + k] += np.asarray(tmpl, np.float32)
        buf = jnp.asarray(buf_np).astype(jnp.bfloat16)
        st = jnp.asarray(starts)
        # production path (auto = the MXU-native jnp form everywhere; the
        # Pallas probe kernel is interpret-validated only — its Mosaic
        # lowering SIGABRTs this runtime's remote compiler)
        q, st0 = preamble_quality_probe(
            buf, st, tmpl, t_e, compute_dtype=jnp.bfloat16
        )
        qn = np.asarray(q, np.float32)
        st0n = np.asarray(st0)
        # numpy golden with the same superset-energy semantics
        b16 = np.asarray(buf, np.float32)  # bf16-rounded samples
        tn = np.asarray(tmpl, np.float32)
        n_lags = 5
        te_f = float(t_e)
        span_rows = -(-(k + n_lags - 1) // 128) + 1
        for s in range(16):
            r0 = int(st0n[s]) // 128
            span = b16[s, r0 * 128 : r0 * 128 + span_rows * 128]
            energy = max(float((span.astype(np.float64) ** 2).sum()), 1e-4 * te_f)
            for o in range(n_lags):
                w = b16[s, int(st0n[s]) + o : int(st0n[s]) + o + k]
                cref = float(np.dot(w.astype(np.float64), tn))
                qref = abs(cref) / np.sqrt(te_f * energy)
                np.testing.assert_allclose(qn[s, o], qref, rtol=2e-2, atol=2e-2)
        # planted preambles probed AT their start peak at the center lag
        assert (np.argmax(qn, -1)[4:] == 2).all(), "peak off-center"

    def check_ofdm_track():
        import dataclasses

        from anet.dsp import ofdm

        for bpc in (2, 4, 6):
            ocfg = dataclasses.replace(ofdm.OfdmConfig(), bits_per_carrier=bpc)
            p = jnp.asarray(rng.integers(0, 256, (4, 96), np.uint8))
            # jit everything complex-valued: EAGER complex64 arithmetic is
            # UNIMPLEMENTED on this remote TPU backend (the ops only exist
            # inside compiled programs)
            w = jax.jit(lambda q: ofdm.transmit(ocfg, q))(p)
            noisy = w + jnp.asarray(
                rng.normal(scale=0.002, size=w.shape).astype(np.float32)
            )
            s_data = ocfg.data_symbols_for_payload(96)
            bits_g, llrs_g, z_eq = jax.jit(
                lambda x: ofdm._equalized_bits(ocfg, x, s_data)
            )(noisy)
            conf_g, snr_g = jax.jit(
                lambda b, z: ofdm._evm_metrics(ocfg, b, z)
            )(bits_g, z_eq)
            bits_f, llrs_f, evm2 = jax.jit(
                lambda x: ofdm._equalized_llrs_fused(ocfg, x, s_data, s_data)
            )(noisy)
            conf_f, _ = ofdm._evm_to_metrics(evm2)
            assert np.array_equal(
                np.asarray(bits_f), np.asarray(bits_g)
            ), f"bpc={bpc}: bits differ"
            lscale = float(np.abs(np.asarray(llrs_g)).max()) or 1.0
            np.testing.assert_allclose(
                np.asarray(llrs_f) / lscale,
                np.asarray(llrs_g) / lscale,
                atol=2e-3,
                err_msg=f"bpc={bpc} llrs",
            )
            np.testing.assert_allclose(
                np.asarray(conf_f), np.asarray(conf_g), rtol=1e-3,
                err_msg=f"bpc={bpc} confidence",
            )

    def check_decide_frame_tm():
        from anet.dsp.frame import (
            demodulate_frame_tm,
            frame_result_from_packed,
        )
        from anet.kernels import decide_frame_tm

        pay = 96
        p = jnp.asarray(rng.integers(0, 256, (6, pay), np.uint8))
        w = np.array(modulate_frame(cfg, p), np.float32)
        w += rng.normal(scale=0.05, size=w.shape).astype(np.float32)
        w[5, w.shape[-1] // 2 :] = 0.0  # bad payload CRC, good header
        wtm = jnp.asarray(w.T)
        ref = demodulate_frame_tm(cfg, wtm, pay, use_pallas=False)
        data = wtm[cfg.preamble_symbols * cfg.samples_per_symbol :, :]
        words, crc_counts, qual, n_sym = decide_frame_tm(cfg, data, pay)
        got = frame_result_from_packed(cfg, words, crc_counts, qual, n_sym, pay)
        for f in ("payload", "magic_ok", "header_crc_ok", "payload_crc_ok", "ok"):
            assert np.array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
            ), f"decide_frame_tm: {f} differs"
        assert bool(got.ok[0]) and not bool(got.ok[5])
        np.testing.assert_allclose(
            np.asarray(got.confidence), np.asarray(ref.confidence), rtol=2e-4
        )

    def check_decide_frame_tm_int8():
        """Quantized-ingest (int8 x int8 -> int32 MXU) full-fusion kernel
        through the REAL Mosaic compiler: packed decisions, payloads and
        verdicts bit-equal to the bf16 kernel at operating noise."""
        from anet.dsp.frame import frame_result_from_packed
        from anet.kernels import decide_frame_tm

        pay = 96
        p = jnp.asarray(rng.integers(0, 256, (6, pay), np.uint8))
        w = np.array(modulate_frame(cfg, p), np.float32)
        w += rng.normal(scale=0.05, size=w.shape).astype(np.float32)
        data = w[:, cfg.preamble_symbols * cfg.samples_per_symbol :].T
        scale = 127.0 / np.abs(data).max()
        d8 = jnp.asarray(np.round(data * scale).astype(np.int8))
        w8, crc8, q8, n_sym = decide_frame_tm(cfg, d8, pay, compute_dtype=jnp.int8)
        wb, crcb, qb, _ = decide_frame_tm(
            cfg, jnp.asarray(data).astype(jnp.bfloat16), pay
        )
        assert np.array_equal(np.asarray(w8), np.asarray(wb)), "int8 words differ"
        got = frame_result_from_packed(cfg, w8, crc8, q8, n_sym, pay)
        ref = frame_result_from_packed(cfg, wb, crcb, qb, n_sym, pay)
        for f in ("payload", "ok", "header_crc_ok", "payload_crc_ok"):
            assert np.array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
            ), f"int8 {f} differs"
        assert bool(np.asarray(got.ok).all()), "int8 frames not ok"
        np.testing.assert_allclose(
            np.asarray(got.confidence), np.asarray(ref.confidence), rtol=2e-3
        )

    def check_probe_at():
        from anet.kernels import probe_at_fused

        tmpl = preamble_waveform(cfg).astype(jnp.bfloat16)
        k = tmpl.shape[-1]
        te = float(jnp.sum(tmpl.astype(jnp.float32) ** 2))
        length = 4 * k + 1024
        sig = rng.normal(scale=0.02, size=(8, length)).astype(np.float32)
        pos = [2, 100, 101, 127, 128, 777, 2048 + 37, 3000]
        tn = np.asarray(tmpl, np.float32)
        for i, ps in enumerate(pos):
            sig[i, ps : ps + k] += tn
        st0 = jnp.asarray([max(ps - 2, 0) for ps in pos], jnp.int32)
        q = np.asarray(
            probe_at_fused(
                jnp.asarray(sig).astype(jnp.bfloat16), st0, tmpl, te,
                start_bound=3100,
            )
        )
        want = np.asarray([min(ps, 2) for ps in pos])
        assert (np.argmax(q, -1) == want).all(), "probe_at peak off"
        assert (q.max(-1) > 0.9).all(), f"probe_at weak: {q.max(-1)}"

    def check_blockmax_search():
        from anet.kernels import sync_search_blockmax

        tmpl = preamble_waveform(cfg).astype(jnp.bfloat16)
        k = tmpl.shape[-1]
        out_len = 4096
        seg_np = rng.normal(scale=0.05, size=(6, out_len + k - 1)).astype(np.float32)
        for i, off in enumerate((0, 777, 2048, 4095, 100, 3000)):
            seg_np[i, off : off + k] += np.asarray(tmpl, np.float32)
        seg = jnp.asarray(seg_np).astype(jnp.bfloat16)
        t_e = jnp.sum(tmpl.astype(jnp.float32) ** 2)
        corr = correlate_template(seg, tmpl, method="matmul")[..., :out_len]
        qref = np.asarray(blockwise_match_quality(seg, corr, k, t_e))
        bref = qref.reshape(6, out_len // 128, 128).max(-1)
        got = np.asarray(sync_search_blockmax(seg, tmpl, out_len, t_e))
        assert np.array_equal(
            got.argmax(-1), bref.argmax(-1)
        ), "best block differs"
        np.testing.assert_allclose(got, bref, rtol=5e-3, atol=5e-3)

    def check_demod_probe():
        """Merged probe+demod: corr/energy match the separate probe's
        semantics class and the demod triple matches demod_at_fused at
        the refined start."""
        from anet.dsp.frame import data_symbols_for_payload
        from anet.kernels import demod_at_fused, demod_probe_fused

        pay = 64
        s = data_symbols_for_payload(cfg, pay)
        t_frame = (cfg.preamble_symbols + s) * cfg.samples_per_symbol
        tmpl = preamble_waveform(cfg).astype(jnp.bfloat16)
        k = tmpl.shape[-1]
        te = float(jnp.sum(tmpl.astype(jnp.float32) ** 2))
        chunkb = 2048
        buf_np = rng.normal(scale=0.05, size=(16, t_frame + chunkb + 4096)).astype(
            np.float32
        )
        starts = rng.integers(2, chunkb, 16).astype(np.int32)
        p = jnp.asarray(rng.integers(0, 256, (16, pay), np.uint8))
        w = np.asarray(modulate_frame(cfg, p), np.float32)
        for i in range(16):
            buf_np[i, starts[i] : starts[i] + t_frame] += w[i]
        buf = jnp.asarray(buf_np).astype(jnp.bfloat16)
        st0 = jnp.asarray(starts - 2)
        cmax, off, en, tone, best, total = demod_probe_fused(
            cfg, buf, st0, s, tmpl, start_bound=chunkb
        )
        q = np.asarray(cmax) / np.sqrt(
            te * np.maximum(np.asarray(en), 1e-4 * te)
        )
        assert (np.asarray(off) == 2).all(), "merged probe peak off-center"
        assert (q > 0.9).all(), f"merged probe weak: {q}"
        # demod at the refined start == demod_at_fused at the true start
        rt, rb, rtot = demod_at_fused(cfg, buf, jnp.asarray(starts), s,
                                      start_bound=chunkb + 2)
        assert np.array_equal(np.asarray(tone), np.asarray(rt)), "tones differ"
        np.testing.assert_allclose(
            np.asarray(best), np.asarray(rb), rtol=1e-5, atol=1e-3
        )

    def check_demod_probe_int8():
        """int8 stream buffer through the merged probe+demod kernel on
        real Mosaic: same servo offsets and tone decisions as the bf16
        kernel, probe quality within quantization tolerance."""
        from anet.dsp.frame import data_symbols_for_payload
        from anet.kernels import demod_probe_fused
        from anet.stream import quantize_int8

        pay = 64
        s = data_symbols_for_payload(cfg, pay)
        t_frame = (cfg.preamble_symbols + s) * cfg.samples_per_symbol
        tmpl = preamble_waveform(cfg)
        te = float(jnp.sum(tmpl.astype(jnp.float32) ** 2))
        chunkb = 2048
        buf_np = rng.normal(scale=0.05, size=(16, t_frame + chunkb + 4096)).astype(
            np.float32
        )
        starts = rng.integers(2, chunkb, 16).astype(np.int32)
        # include the 128-lane row-boundary residues the servo window crosses
        starts[:4] = [126, 127, 128, 129]
        p = jnp.asarray(rng.integers(0, 256, (16, pay), np.uint8))
        w = np.asarray(modulate_frame(cfg, p), np.float32)
        for i in range(16):
            buf_np[i, starts[i] : starts[i] + t_frame] += w[i]
        st0 = jnp.asarray(starts - 2)
        buf16 = jnp.asarray(buf_np).astype(jnp.bfloat16)
        buf8 = quantize_int8(jnp.asarray(buf_np))
        c16, o16, e16, t16, _b16, _tt16 = demod_probe_fused(
            cfg, buf16, st0, s, tmpl.astype(jnp.bfloat16), start_bound=chunkb
        )
        c8, o8, e8, t8, _b8, _tt8 = demod_probe_fused(
            cfg, buf8, st0, s, tmpl, start_bound=chunkb
        )
        assert np.array_equal(np.asarray(o8), np.asarray(o16)), "servo offs differ"
        assert np.array_equal(np.asarray(t8), np.asarray(t16)), "tones differ"
        q8 = np.asarray(c8) / np.sqrt(te * np.maximum(np.asarray(e8), 1e-4 * te))
        q16 = np.asarray(c16) / np.sqrt(
            te * np.maximum(np.asarray(e16), 1e-4 * te)
        )
        assert (q8 > 0.9).all(), f"int8 probe weak: {q8}"
        np.testing.assert_allclose(q8, q16, atol=0.03)

    check("decide_tones_tm (time-major fused demod)", check_decide_tm)
    check("decide_frame_tm full fusion vs jnp parse", check_decide_frame_tm)
    check("decide_frame_tm int8 ingest vs bf16", check_decide_frame_tm_int8)
    check("demod_probe_fused merged probe+demod", check_demod_probe)
    check("demod_probe_fused int8 stream buffer vs bf16", check_demod_probe_int8)
    check("probe_at_fused span-DMA probe", check_probe_at)
    check("sync_search_blockmax vs quality golden", check_blockmax_search)
    check("demodulate_frame_tm end-to-end", check_frame_tm)
    check("viterbi_trellis bit-exact vs scan", check_viterbi)
    check("correlate_fused vs block-Toeplitz", check_correlator)
    check("aligned_gather onehot == dma", check_gather_onehot)
    check("blockwise quality within tolerance", check_blockwise_quality)
    check("sync_search_fused vs quality golden", check_sync_search)
    check("demod_at_fused vs gather+demod", check_demod_at)
    check("preamble probe (production path) vs numpy golden", check_probe)
    n_total = 15
    # Retired-kernel check, opt-in: ofdm_track_decide_fused is a measured
    # record (never dispatched — ~2000x slower than the jnp equalizer,
    # docs/PERF.md round-4 NULL #3); validating it costs real chip+compile
    # time on every pass, so it runs only when the experiment flag that
    # re-enables the kernel is set.
    import os

    if os.environ.get("ANET_OFDM_FUSED"):
        check("ofdm_track_decide_fused vs jnp equalizer (retired)", check_ofdm_track)
        n_total += 1
    print(f"{n_total - len(FAILURES)}/{n_total} passed")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
