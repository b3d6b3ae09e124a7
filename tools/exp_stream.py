"""Round-3 streaming-path experiments on the chip.

Measures each stream-step stage in isolation plus the full path, so every
kernel change lands with a number attached. Run in the background (never
under a killable timeout — a killed TPU claim wedges the remote pool):

    nohup python tools/exp_stream.py > /tmp/exp_stream.log 2>&1 &

Prints one labelled line per measurement; PERF.md's round-3 table is
assembled from these.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=10):
    """Compile, then time fn(*args) with a device->host read per iter."""
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    import jax

    from anet.utils.compilecache import enable as _cc

    _cc()  # persistent compile cache: warm re-runs through the tunnel
    import jax.numpy as jnp

    from anet import stream
    from anet.dsp import family
    from anet.dsp.sync import aligned_gather, blockwise_match_quality
    from anet.kernels import correlate_fused, gather_rows_fused
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    cfg = get_model(os.environ.get("EXP_MODEL", "mfsk16-fast")).config
    payload_len = 256
    batch = int(os.environ.get("EXP_BATCH", "8192"))
    chunk = 32768
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = min(chunk, t_frame)
    rng = np.random.default_rng(0)

    # --- correctness through real Mosaic (moderate size) ---
    tmpl32 = family.preamble_template(cfg)
    k = tmpl32.shape[-1]
    tmpl = tmpl32.astype(jnp.bfloat16)
    seg = jnp.asarray(rng.normal(size=(64, 4096 + k - 1)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    from anet.dsp.sync import correlate_template

    ref = correlate_template(seg, tmpl, method="matmul")
    got = correlate_fused(seg, tmpl, 4096)
    err = float(
        np.max(np.abs(np.asarray(got) - np.asarray(ref)))
        / (np.max(np.abs(np.asarray(ref))) or 1.0)
    )
    print(f"VALIDATE corr rel_err={err:.2e} {'OK' if err < 2e-2 else 'FAIL'}", flush=True)

    from anet.kernels import sync_search_fused

    t_e32 = jnp.sum(tmpl32 * tmpl32)
    q_ref = blockwise_match_quality(seg, ref[..., :4096], k, t_e32)
    sq, si = sync_search_fused(seg, tmpl, 4096, t_e32)
    # idx may differ from the jnp argmax only on near-ties (the kernel's
    # bf16 rounding order differs): require the quality AT the returned
    # index to be within rounding of the true max.
    qn = np.asarray(q_ref)
    at_got = np.take_along_axis(qn, np.asarray(si)[:, None], 1)[:, 0]
    idx_ok = bool(np.all(qn.max(-1) - at_got <= 1e-3))
    qerr = float(np.max(np.abs(np.asarray(sq) - qn.max(-1))))
    print(
        f"VALIDATE search idx={'OK' if idx_ok else 'FAIL'} qerr={qerr:.2e}",
        flush=True,
    )

    n = t_frame + chunk
    xg = jnp.asarray(rng.normal(size=(512, n)).astype(np.float32))
    sg = jnp.asarray(rng.integers(0, n - t_frame, 512), jnp.int32)
    a = aligned_gather(xg, sg, t_frame, mode="dma")
    b = gather_rows_fused(xg, sg, t_frame)
    print(
        "VALIDATE gather_rows exact:",
        np.array_equal(np.asarray(a), np.asarray(b)),
        flush=True,
    )

    # --- stage timings at bench size ---
    L = t_frame + chunk
    buf32 = jnp.asarray(rng.normal(size=(batch, L)).astype(np.float32))
    buf16 = buf32.astype(jnp.bfloat16)
    starts = jnp.asarray(rng.integers(0, L - t_frame, batch), jnp.int32)
    segb = jnp.asarray(
        rng.normal(size=(batch, chunk + k - 1)).astype(np.float32)
    ).astype(jnp.bfloat16)

    jit = jax.jit

    timeit(
        "gather onehot f32buf->bf16 (round-2 prod)",
        jit(lambda x, s: aligned_gather(x, s, t_frame, jnp.bfloat16, mode="onehot").sum()),
        buf32,
        starts,
    )
    timeit(
        "gather roll f32buf",
        jit(lambda x, s: gather_rows_fused(x, s, t_frame).sum()),
        buf32,
        starts,
    )
    timeit(
        "gather roll bf16buf",
        jit(lambda x, s: gather_rows_fused(x, s, t_frame).astype(jnp.float32).sum()),
        buf16,
        starts,
    )
    timeit(
        "corr fused v2 bf16",
        jit(lambda x: correlate_fused(x, tmpl, chunk).sum()),
        segb,
    )
    t_e = jnp.sum(tmpl32 * tmpl32)
    timeit(
        "blockwise quality",
        jit(lambda s, c: blockwise_match_quality(s, c, k, t_e).sum()),
        segb,
        correlate_fused(segb, tmpl, chunk),
    )
    timeit(
        "sync_search_fused bf16 (corr+quality+argmax)",
        jit(
            lambda s: sum(
                x.sum() for x in sync_search_fused(s, tmpl, chunk, t_e)
            )
        ),
        segb,
    )

    # --- full streaming path (auto-dispatched kernels) ---
    payloads = jnp.asarray(rng.integers(0, 256, (batch, payload_len), dtype=np.uint8))
    wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
    gap = 1000
    nframes = 3
    per = gap + t_frame
    total = -(-(nframes * per) // chunk) * chunk
    cap = np.zeros((batch, total), np.float32)
    for i in range(nframes):
        cap[:, i * per + gap : i * per + gap + t_frame] = wave
    # bf16 capture on device: the stream slides/correlates bf16 anyway,
    # and the f32 original at B=8192 (4.3 GB) OOMs next to the buffers.
    capture = jnp.asarray(cap).astype(jnp.bfloat16)
    del cap

    @jax.jit
    def run(capture):
        res = stream.receive_stream(
            cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
        )
        return res.carry.frames_ok.sum()

    ok = int(run(capture))
    nsteps = total // chunk
    dt = timeit(f"full stream ({nsteps} steps)", run, capture, iters=5)
    if dt:
        ms = batch * total / dt / 1e6
        print(
            f"STREAM: {ms:.0f} Msamples/s  frames_ok={ok/(batch*nframes):.3f}"
            f"  per-step {dt/nsteps*1e3:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
