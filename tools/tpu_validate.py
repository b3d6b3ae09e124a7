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

    check("decide_tones_tm (time-major fused demod)", check_decide_tm)
    check("demodulate_frame_tm end-to-end", check_frame_tm)
    check("viterbi_trellis bit-exact vs scan", check_viterbi)
    check("correlate_fused vs block-Toeplitz", check_correlator)
    check("aligned_gather onehot == dma", check_gather_onehot)
    check("blockwise quality within tolerance", check_blockwise_quality)

    print(f"{6 - len(FAILURES)}/6 passed")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
