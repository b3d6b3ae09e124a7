"""Round-4: the aligned headline decomposed after the full-fusion kernel.

Isolates (B=16384, mfsk16-fast, 256-B payloads, bf16):
  - decide_tones_tm kernel alone (round-2/3 form)
  - decide_frame_tm kernel alone (round-4 full fusion: packed words +
    in-kernel CRC accumulators + quality sums)
  - demodulate_frame_tm end-to-end, old parse vs packed parse
so the residual between kernel-only and end-to-end is pinned to the XLA
tail + dispatch, and the 120 Gsamp/s question gets a measured answer.

    nohup python tools/exp_headline.py > /tmp/exp_headline.log 2>&1 &
"""

from __future__ import annotations

import os
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
    from anet.dsp.frame import (
        demodulate_frame_tm,
        frame_result_from_packed,
        frame_result_from_tone_decisions,
    )
    from anet.kernels import decide_frame_tm, decide_tones_tm
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    # throwaway first measurement: the FIRST timed loop of a fresh
    # process through the tunnel reports 100-3000x the true time (lazy
    # pool init lands inside it — docs/PERF.md sharp edge #7)
    import jax.numpy as _jnp
    timeit("warmup (discard)", jax.jit(lambda x: (x @ x).sum()),
           _jnp.ones((1024, 1024), _jnp.bfloat16), iters=3)
    cfg = get_model("mfsk16-fast").config
    pay = 256
    batch = int(os.environ.get("EXP_BATCH", "16384"))
    t_frame = family.frame_samples(cfg, pay)
    rng = np.random.default_rng(0)
    distinct = 64
    p = jnp.asarray(rng.integers(0, 256, (distinct, pay), np.uint8))
    w64 = jax.jit(family.transmit_fn(cfg))(p)
    waves = jax.jit(
        lambda x: jnp.tile(x, (batch // distinct, 1)).T.astype(jnp.bfloat16)
    )(w64)
    waves.block_until_ready()
    samples = batch * t_frame
    pre = cfg.preamble_symbols * cfg.samples_per_symbol

    @jax.jit
    def k_tones(w):
        tone, best, total = decide_tones_tm(cfg, w[pre:, :])
        return tone.sum() + best.sum() + total.sum()

    @jax.jit
    def k_frame(w):
        words, crc, qual, _ = decide_frame_tm(cfg, w[pre:, :], pay)
        return words.sum() + crc.sum() + qual.sum()

    @jax.jit
    def e2e_old(w):
        tone, best, total = decide_tones_tm(cfg, w[pre:, :])
        r = frame_result_from_tone_decisions(cfg, tone.T, best.T, total.T, pay)
        return jnp.sum(r.ok.astype(jnp.int32))

    @jax.jit
    def e2e_packed(w):
        r = demodulate_frame_tm(cfg, w, pay, compute_dtype=jnp.bfloat16)
        return jnp.sum(r.ok.astype(jnp.int32))

    for label, fn in (
        ("decide_tones_tm kernel only", k_tones),
        ("decide_frame_tm kernel only (full fusion)", k_frame),
        ("end-to-end, decisions kernel + XLA parse", e2e_old),
        ("end-to-end, full-fusion kernel + packed parse", e2e_packed),
    ):
        timeit(label, fn, waves, samples=samples)
    ok = int(e2e_packed(waves))
    print(f"frames_ok = {ok}/{batch}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
