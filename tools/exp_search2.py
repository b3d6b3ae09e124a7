"""Round-4: the always-search stream step, bisected in-scan.

stream-search measured ~55 ms/step at chunk 36352 after the block-maxima
search landed — far above blockmax + demod + slide. This isolates the
stages WHERE THEY RUN (inside scan, carry threaded), mirroring
exp_stream2's lock-mode bisection:

    slide only
    slide + sync_search_blockmax (+ XLA argmax fold)
    slide + blockmax + probe refine        (= _search_best)
    slide + old sync_search_fused          (the round-3 fused form)
    slide + _search_best + demod_at_fused
    full search-mode stream_step

    nohup python tools/exp_search2.py > /tmp/exp_search2.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=6):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    import jax

    from anet.utils.compilecache import enable as _cc

    _cc()
    import jax.numpy as jnp

    from anet import stream
    from anet.dsp import family
    from anet.dsp.frame import data_symbols_for_payload
    from anet.kernels import (
        demod_at_fused,
        probe_at_fused,
        sync_search_blockmax,
        sync_search_fused,
    )
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    # throwaway first measurement: the FIRST timed loop of a fresh
    # process through the tunnel reports 100-3000x the true time (lazy
    # pool init lands inside it — docs/PERF.md sharp edge #7)
    import jax.numpy as _jnp
    timeit("warmup (discard)", jax.jit(lambda x: (x @ x).sum()),
           _jnp.ones((1024, 1024), _jnp.bfloat16), iters=3)
    cfg = get_model("mfsk16-fast").config
    payload_len = 256
    batch = int(os.environ.get("EXP_BATCH", "8192"))
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = t_frame // 128 * 128
    n_symbols = data_symbols_for_payload(cfg, payload_len)
    rng = np.random.default_rng(0)

    # search-mode bench layout: gapped frames
    distinct = 64
    payloads = jnp.asarray(
        rng.integers(0, 256, (distinct, payload_len), dtype=np.uint8)
    )
    wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
    gap0, gap, nframes = 1000, 1000, 3
    per = gap + t_frame
    total = -(-(gap0 - gap + nframes * per) // chunk) * chunk
    cap = np.zeros((distinct, total), np.float32)
    for i in range(nframes):
        cap[:, gap0 + i * per : gap0 + i * per + t_frame] = wave
    capture = jax.jit(
        lambda x: jnp.tile(x, (batch // distinct, 1)).astype(jnp.bfloat16)
    )(jnp.asarray(cap))
    capture.block_until_ready()
    nsteps = total // chunk

    _, template, _ = stream.family_geometry(cfg, payload_len, jnp.bfloat16)
    t_c = template
    t_energy = jnp.sum(t_c.astype(jnp.float32) ** 2)
    k = t_c.shape[-1]

    def scan_of(step_fn):
        @jax.jit
        def run(capr):
            def body(c, i):
                chunk_i = jax.lax.dynamic_index_in_dim(
                    capr, i, axis=-2, keepdims=False
                )
                return step_fn(c, chunk_i)

            c0 = stream.init_carry(
                cfg, chunk, payload_len, (batch,), dtype=jnp.bfloat16
            )
            fc, outs = jax.lax.scan(body, c0, jnp.arange(nsteps))
            return fc.frames_ok.sum() + jax.tree_util.tree_leaves(outs)[0].sum()

        return run

    def step_slide(c, ch):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch, t_frame, 0)
        return c._replace(buffer=buffer, samples_seen=seen), seen.sum()

    def step_blockmax(c, ch):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch, t_frame, 0)
        seg = jax.lax.dynamic_slice_in_dim(buffer, w0, chunk + k - 1, axis=-1)
        bm = sync_search_blockmax(seg, t_c, chunk, t_energy)
        out = jnp.max(bm, -1).sum() + jnp.argmax(bm, -1).sum()
        return c._replace(buffer=buffer, samples_seen=seen), out

    def step_search_best(c, ch):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch, t_frame, 0)
        seg = jax.lax.dynamic_slice_in_dim(buffer, w0, chunk + k - 1, axis=-1)
        bq, br = stream._tpu_search(seg, chunk, t_c, t_energy)
        return c._replace(buffer=buffer, samples_seen=seen), bq.sum() + br.sum()

    def step_old_fused(c, ch):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch, t_frame, 0)
        seg = jax.lax.dynamic_slice_in_dim(buffer, w0, chunk + k - 1, axis=-1)
        bq, br = sync_search_fused(seg, t_c, chunk, t_energy)
        return c._replace(buffer=buffer, samples_seen=seen), bq.sum() + br.sum()

    def step_search_demod(c, ch):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch, t_frame, 0)
        seg = jax.lax.dynamic_slice_in_dim(buffer, w0, chunk + k - 1, axis=-1)
        bq, br = stream._tpu_search(seg, chunk, t_c, t_energy)
        start_idx = jnp.clip(w0 + br, 0, chunk)
        tone, best, tot = demod_at_fused(
            cfg, buffer, start_idx, n_symbols, start_bound=chunk
        )
        return (
            c._replace(buffer=buffer, samples_seen=seen),
            bq.sum() + tone.sum() + best.sum() + tot.sum(),
        )

    def step_full(c, ch):
        nc, out = stream.stream_step(
            cfg, c, ch, payload_len, compute_dtype=jnp.bfloat16, lock=False
        )
        return nc, out.quality.sum()

    capr = capture.reshape(batch, nsteps, chunk)
    for label, fn in (
        ("scan slide", step_slide),
        ("scan slide+blockmax", step_blockmax),
        ("scan slide+search_best (blockmax+probe)", step_search_best),
        ("scan slide+OLD sync_search_fused", step_old_fused),
        ("scan slide+search_best+demod", step_search_demod),
        ("scan full search step", step_full),
    ):
        dt = timeit(label, scan_of(fn), capr)
        if dt:
            print(f"  -> {dt/nsteps*1e3:.2f} ms/step", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
