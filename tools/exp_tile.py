"""Round-5 sweep: streams-per-cell tile (DA_STREAM_TILE) of the fused
align+demod kernels, measured on the locked-stream bench geometry.

docs/PERF.md (round 5): the locked step is serialization-bound in the
per-stream machinery — ~26 us per grid cell across B/bs cells, not
bandwidth-bound. The per-cell cost has a large fixed component (DMA
issue serialization, the one-hot shift builds), so a bigger tile should
amortize it; the bound is VMEM (double-buffered slab scratch is
2*bs*sv*128 elements).

One process per tile value (DA_STREAM_TILE is read at anet.kernels
import); run the sweep with:

    for t in 8 16 32 64; do
      ANET_NO_COMPILE_CACHE=1 ANET_DA_TILE=$t python tools/exp_tile.py
    done > /tmp/exp_tile.log 2>&1 &

ANET_NO_COMPILE_CACHE keeps experiment programs out of the committed
bench cache. The first timed loop of a fresh process through the tunnel
over-reports (docs/PERF.md sharp edge #7), so a throwaway measurement
runs first.
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
    from anet.kernels import DA_STREAM_TILE

    cfg = get_model(os.environ.get("EXP_MODEL", "mfsk16-fast")).config
    payload_len = 256
    batch = int(os.environ.get("EXP_BATCH", "8192"))
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = t_frame // 128 * 128
    chunk = min(chunk, t_frame)
    rng = np.random.default_rng(0)

    # bench.py's lock layout: one acquisition gap, then contiguous frames
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
    capture = jax.jit(
        lambda x: jnp.tile(x, (batch // distinct, 1)).astype(jnp.bfloat16)
    )(jnp.asarray(cap))
    capture.block_until_ready()

    def make_warm_carry():
        c = stream.init_carry(cfg, chunk, payload_len, (batch,), dtype=jnp.bfloat16)
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

    iters = int(os.environ.get("EXP_ITERS", "10"))
    ok = int(run(capture))  # warmup/compile
    _ = int(run(capture))  # throwaway first timed loop (sharp edge #7)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(capture)
    ok = int(out)
    dt = time.perf_counter() - t0
    nsteps = total // chunk
    ms = batch * total * iters / dt / 1e6
    print(
        f"tile={DA_STREAM_TILE}  B={batch}  chunk={chunk}  steps={nsteps}  "
        f"{dt / iters / nsteps * 1e3:.2f} ms/step  {ms:.0f} Msamp/s  "
        f"frames_ok={ok / (batch * nframes):.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
