"""Round-5 experiment: int8 sliding stream buffer vs bf16 on the locked
stream bench geometry (the round-5 PERF.md "remaining unexplored lever").

The locked step is serialization-bound in the per-stream span machinery
(~26 us/cell — docs/PERF.md round-5 autopsy), so the prior is that
halving the slab DMA and shift BYTES (int8 buffer, int8 x int8 -> int32
MXU paths) moves little unless part of that per-cell cost is actually
byte-proportional. This measures it: same capture, same warm-lock
layout, carry dtype bf16 vs int8 (capture quantized once at the ingest
edge, untimed — mirroring the bench's untimed bf16 cast).

Run (one process measures both):

    ANET_NO_COMPILE_CACHE=1 python tools/exp_stream_int8.py

The first timed loop of a fresh process through the tunnel over-reports
(docs/PERF.md sharp edge #7), so a throwaway measurement runs first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from anet import stream
    from anet.dsp import family
    from anet.models import get_model

    cfg = get_model(os.environ.get("EXP_MODEL", "mfsk16-fast")).config
    payload_len = 256
    batch = int(os.environ.get("EXP_BATCH", "8192"))
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = min(t_frame // 128 * 128, t_frame)
    rng = np.random.default_rng(0)

    gap0, nframes = 1000, 6
    budget = 4.8e9
    while nframes > 2:
        total = -(-(gap0 + nframes * t_frame) // chunk) * chunk
        if batch * total * 2 <= budget:
            break
        nframes -= 1
    total = -(-(gap0 + nframes * t_frame) // chunk) * chunk
    distinct = 64
    cap = np.zeros((distinct, total), np.float32)
    payloads = jnp.asarray(
        rng.integers(0, 256, (distinct, payload_len), dtype=np.uint8)
    )
    wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
    for i in range(nframes):
        cap[:, gap0 + i * t_frame : gap0 + (i + 1) * t_frame] = wave
    cap += 0.02 * rng.standard_normal(cap.shape).astype(np.float32)
    cap_j = jnp.asarray(cap)
    capture16 = jax.jit(
        lambda x: jnp.tile(x, (batch // distinct, 1)).astype(jnp.bfloat16)
    )(cap_j)
    capture16.block_until_ready()
    # int8 ingest: quantize ONCE at the edge (untimed), like the bf16 cast
    capture8 = jax.jit(
        lambda x: stream.quantize_int8(jnp.tile(x, (batch // distinct, 1)))
    )(cap_j)
    capture8.block_until_ready()

    iters = int(os.environ.get("EXP_ITERS", "10"))
    nsteps = total // chunk

    def bench(dtype, capture, label):
        def make_warm_carry():
            c = stream.init_carry(cfg, chunk, payload_len, (batch,), dtype=dtype)
            return c._replace(
                locked=jnp.ones((batch,), jnp.bool_),
                next_start=jnp.full((batch,), gap0, c.next_start.dtype),
            )

        @jax.jit
        def run(capture):
            res = stream.receive_stream(
                cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16,
                lock=True, carry=make_warm_carry(), resident=False,
            )
            return res.carry.frames_ok.sum()

        ok = int(run(capture))  # warmup/compile
        _ = int(run(capture))  # throwaway first timed loop (sharp edge #7)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(capture)
        ok = int(out)
        dt = time.perf_counter() - t0
        ms = batch * total * iters / dt / 1e6
        print(
            f"{label}:  B={batch}  chunk={chunk}  steps={nsteps}  "
            f"{dt / iters / nsteps * 1e3:.2f} ms/step  {ms:.0f} Msamp/s  "
            f"frames_ok={ok / (batch * nframes):.3f}",
            flush=True,
        )
        return ms

    ms16 = bench(jnp.bfloat16, capture16, "bf16 carry")
    ms8 = bench(jnp.int8, capture8, "int8 carry")
    print(f"int8/bf16 speedup: {ms8 / ms16:.3f}x", flush=True)


if __name__ == "__main__":
    main()
