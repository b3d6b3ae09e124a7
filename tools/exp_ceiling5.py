"""Round-5: re-measure the runtime's ceilings + the headline's slice tax.

Round-4 numbers (v5e-class: 363 GB/s read+reduce, 177 TFLOP/s bf16,
headline kernel 5.92 ms at B=16384) no longer match fresh measurements
(decide_frame_tm at 2.33 ms = 512 GB/s-equivalent). Either the remote
chip changed between rounds or the old measurements carried a hidden
copy. This pins it:

  1. f32 read+reduce ceiling, 2 GB (the round-3 probe, verbatim)
  2. bf16 matmul 8192^3 (TFLOP/s)
  3. decide_frame_tm on PRE-SLICED data vs sliced-in-jit full frames
     (the bench wrapper's `samples_tm[pre:]` slice feeding a Pallas
     operand may materialize a copy)

    nohup python tools/exp_ceiling5.py > /tmp/exp_ceiling5.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=20, gb=None, samples=None):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        extra = ""
        if gb:
            extra += f"  = {gb / dt:.0f} GB/s"
        if samples:
            extra += f"  = {samples / dt / 1e9:.2f} Gsamp/s"
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

    print("backend:", jax.default_backend(), flush=True)
    print("device:", jax.devices()[0].device_kind, flush=True)

    # 1. read+reduce ceiling
    big = jnp.ones((512 * 2**20,), jnp.float32)  # 2 GB
    red = jax.jit(lambda x: x.sum())
    timeit("throwaway", red, big, iters=3)
    timeit("f32 read+reduce 2 GB", red, big, gb=2.0)

    # 2. MXU ceiling
    a = jnp.ones((8192, 8192), jnp.bfloat16)
    mm = jax.jit(lambda x: jnp.dot(x, x, preferred_element_type=jnp.float32).sum())
    t = timeit("bf16 matmul 8192^3", mm, a)
    if t:
        print(f"  = {2 * 8192**3 / t / 1e12:.0f} TFLOP/s", flush=True)
    del a, big

    # 3. the slice tax
    from anet.dsp import family
    from anet.dsp.frame import demodulate_frame_tm, frame_result_from_packed
    from anet.kernels import decide_frame_tm
    from anet.models import get_model

    cfg = get_model("mfsk16-fast").config
    pay = 256
    B = 16384
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, (B, pay), np.uint8))
    waves = jax.jit(
        lambda p: family.transmit_fn(cfg)(p).T.astype(jnp.bfloat16)
    )(payloads)  # [T, B] bf16, full frames incl preamble
    t_frame = family.frame_samples(cfg, pay)
    pre = cfg.preamble_symbols * cfg.samples_per_symbol
    data = jax.jit(lambda w: w[pre:])(waves)
    jax.block_until_ready((waves, data))
    samples = B * t_frame

    @jax.jit
    def full_wrapper(w):  # the bench's exact step
        return demodulate_frame_tm(
            cfg, w, pay, compute_dtype=jnp.bfloat16
        ).ok.astype(jnp.int32).sum()

    @jax.jit
    def presliced(d):
        words, crc, qual, n = decide_frame_tm(cfg, d, pay)
        return frame_result_from_packed(cfg, words, crc, qual, n, pay).ok.sum()

    timeit("bench wrapper (slice in-jit, full frames)", full_wrapper, waves,
           samples=samples)
    timeit("pre-sliced data section", presliced, data, samples=samples)


if __name__ == "__main__":
    main()
