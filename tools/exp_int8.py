"""Round-5: int8 quantized ingest for the read-bound headline kernel.

The full-fusion kernel reads a bf16 capture at ~202 GB/s (56% of the
measured 363 GB/s ceiling) and its consumer is an argmax with enormous
decision margins — an int8 ingest halves the mandatory HBM read
(round-4 verdict, weak #5; the firmware itself decodes fixed-point,
reference lib/libopus config.h:29). Measures, B=16384 mfsk16-fast 256 B:

  1. decide_frame_tm bf16 (the production headline) end-to-end
  2. decide_frame_tm int8 (x127 basis, int8 x int8 -> int32 MXU)
  3. frames_ok parity + BER spot-check at the operating SNR: decisions
     from the two ingests on the SAME noisy capture must agree

First timed loop of a fresh process is a throwaway (docs/PERF.md sharp
edge #7).

    nohup python tools/exp_int8.py > /tmp/exp_int8.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=30, samples=None):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        extra = f"  = {samples / dt / 1e9:.2f} Gsamp/s" if samples else ""
        print(f"{label}: {dt*1e3:.3f} ms{extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    import jax

    from anet.utils.compilecache import enable as _cc

    _cc()
    import jax.numpy as jnp

    from anet.dsp import family
    from anet.dsp.frame import frame_result_from_packed
    from anet.kernels import decide_frame_tm
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    cfg = get_model("mfsk16-fast").config
    pay = 256
    B = 16384
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, (B, pay), np.uint8))
    waves = jax.jit(family.transmit_fn(cfg))(payloads)
    t_frame = family.frame_samples(cfg, pay)
    pre = cfg.preamble_symbols * cfg.samples_per_symbol
    samples = B * t_frame  # headline convention: whole-frame samples

    # operating-noise capture (SNR well above threshold, like bench noise
    # floor) — quantization must not flip any decision
    noisy = jax.jit(
        lambda w, k: w + 0.05 * jax.random.normal(k, w.shape, jnp.float32)
    )(waves, jax.random.PRNGKey(1))
    data_tm = jax.jit(lambda x: x[:, pre:].T)(noisy)

    d_bf16 = jax.jit(lambda x: x.astype(jnp.bfloat16))(data_tm)
    # per-capture scale, computed on device once (the untimed edge cast)
    scale = float(127.0 / jnp.max(jnp.abs(data_tm)))
    d_int8 = jax.jit(lambda x: jnp.round(x * scale).astype(jnp.int8))(data_tm)
    jax.block_until_ready((d_bf16, d_int8))

    @jax.jit
    def run_bf16(d):
        words, crc, qual, n = decide_frame_tm(cfg, d, pay)
        return frame_result_from_packed(cfg, words, crc, qual, n, pay).ok.sum()

    @jax.jit
    def run_int8(d):
        words, crc, qual, n = decide_frame_tm(cfg, d, pay, compute_dtype=jnp.int8)
        return frame_result_from_packed(cfg, words, crc, qual, n, pay).ok.sum()

    timeit("throwaway (first-loop anomaly)", run_bf16, d_bf16, iters=3)
    t_b = timeit("decide_frame_tm bf16 end-to-end", run_bf16, d_bf16, samples=samples)
    t_i = timeit("decide_frame_tm int8 end-to-end", run_int8, d_int8, samples=samples)
    ok_b = int(run_bf16(d_bf16))
    ok_i = int(run_int8(d_int8))
    print(f"frames_ok bf16 {ok_b}/{B}  int8 {ok_i}/{B}", flush=True)
    if t_b and t_i:
        print(f"speedup: {t_b / t_i:.2f}x", flush=True)

    # BER spot-check near the operating threshold (0 dB waveform SNR for
    # mfsk16-fast per models.OPERATING_SNR_DB): same noisy capture, both
    # ingests — decision parity is the pass criterion. Free the perf
    # arrays first: keeping them alongside two more noisy copies
    # RESOURCE_EXHAUSTs the 16 GB HBM at B=16384.
    from anet.channel import awgn

    del noisy, data_tm, d_bf16, d_int8
    noisy2 = jax.jit(lambda k, w: awgn(k, w, 5.0))(jax.random.PRNGKey(2), waves)
    del waves
    d2 = jax.jit(lambda x: x[:, pre:].T)(noisy2)
    del noisy2
    s2 = float(127.0 / jnp.max(jnp.abs(d2)))
    w_b = decide_frame_tm(cfg, jax.jit(lambda x: x.astype(jnp.bfloat16))(d2), pay)[0]
    w_i = decide_frame_tm(
        cfg, jax.jit(lambda x: jnp.round(x * s2).astype(jnp.int8))(d2), pay,
        compute_dtype=jnp.int8,
    )[0]
    neq = int(jnp.sum(w_b != w_i))
    total_words = int(np.prod(w_b.shape))
    print(
        f"packed-word disagreement at 5 dB: {neq}/{total_words} "
        f"({neq / total_words:.2e})",
        flush=True,
    )


if __name__ == "__main__":
    main()
