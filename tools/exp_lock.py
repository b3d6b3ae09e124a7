"""Round-3 frame-lock step profile on the chip.

The lock-mode streaming receiver measured 6.6 Gsamples/s (40.5 ms/step
averaged over 5 steady + 2 acquisition steps at B=8192, chunk 32768);
the 10 G target needs the steady-state step under ~27 ms. This measures
each stage of the steady-state step in isolation so the next kernel
change lands with a number attached:

    slide        buffer concatenate (ring-buffer analog)
    probe        preamble_quality_probe at the predicted start
    demod_at     fused align+demod from the carry buffer
    parse        frame_result_from_tone_decisions epilogue
    lock step    one full stream_step(lock=True) steady-state
    stream       the bench's full lock-mode capture

Run in the background (never under a killable timeout — a killed TPU
claim wedges the remote pool):

    nohup python tools/exp_lock.py > /tmp/exp_lock.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=10):
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

    _cc()
    import jax.numpy as jnp

    from anet import stream
    from anet.dsp import family
    from anet.dsp.frame import (
        data_symbols_for_payload,
        frame_result_from_tone_decisions,
    )
    from anet.dsp.sync import preamble_quality_probe
    from anet.kernels import demod_at_fused
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    cfg = get_model(os.environ.get("EXP_MODEL", "mfsk16-fast")).config
    payload_len = 256
    batch = int(os.environ.get("EXP_BATCH", "8192"))
    chunk = 32768
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = min(chunk, t_frame)
    n_symbols = data_symbols_for_payload(cfg, payload_len)
    rng = np.random.default_rng(0)

    carry = stream.init_carry(cfg, chunk, payload_len, (batch,), dtype=jnp.bfloat16)
    L = carry.buffer.shape[-1]
    print(f"frame {t_frame}  chunk {chunk}  buffer {L}", flush=True)
    buf = jnp.asarray(rng.normal(size=(batch, L)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    carry = carry._replace(buffer=buf)
    chunk_arr = jnp.asarray(
        rng.normal(size=(batch, chunk)).astype(np.float32)
    ).astype(jnp.bfloat16)
    starts = jnp.asarray(rng.integers(0, chunk, batch), jnp.int32)

    tmpl32 = family.preamble_template(cfg)
    tmpl = tmpl32.astype(jnp.bfloat16)
    t_e = jnp.sum(tmpl32 * tmpl32)

    # --- stage timings ---
    def slide_only(c, ch):
        b, seen, w0, abs0 = stream._slide_buffer(c, ch, t_frame, 0)
        return b.sum()

    timeit("slide", jax.jit(slide_only), carry, chunk_arr)

    timeit(
        "probe (jnp)",
        jax.jit(
            lambda b, s: sum(
                x.sum()
                for x in preamble_quality_probe(
                    b, s, tmpl, t_e, compute_dtype=jnp.bfloat16
                )
            )
        ),
        buf,
        starts,
    )

    timeit(
        "demod_at_fused (padded buffer)",
        jax.jit(
            lambda b, s: sum(
                x.sum()
                for x in demod_at_fused(
                    cfg, b, s, n_symbols, start_bound=chunk
                )
            )
        ),
        buf,
        starts,
    )

    tone, best, total = demod_at_fused(cfg, buf, starts, n_symbols, start_bound=chunk)
    timeit(
        "parse epilogue",
        jax.jit(
            lambda t, b, tt: frame_result_from_tone_decisions(
                cfg, t, b, tt, payload_len
            ).ok.sum()
        ),
        tone,
        best,
        total,
    )

    # --- one full steady-state lock step (locked carry, valid prediction) ---
    lcarry = carry._replace(
        locked=jnp.ones(batch, jnp.bool_),
        # prediction inside the just-completed window
        next_start=jnp.full((batch,), 0, jnp.int32),
        samples_seen=jnp.zeros(batch, jnp.int32),
    )

    def lock_step(c, ch):
        nc, out = stream.stream_step(
            cfg, c, ch, payload_len, compute_dtype=jnp.bfloat16, lock=True
        )
        return nc.frames_ok.sum() + out.quality.sum()

    timeit("lock step (steady, probe fails->search)", jax.jit(lock_step), lcarry, chunk_arr)

    # steady step where the probe HOLDS: build a real capture so the
    # prediction verifies and the search cond is skipped
    payloads = jnp.asarray(rng.integers(0, 256, (batch, payload_len), dtype=np.uint8))
    wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
    gap0, nframes = 1000, 6
    total_n = -(-(gap0 + nframes * t_frame) // chunk) * chunk
    cap = np.zeros((batch, total_n), np.float32)
    for i in range(nframes):
        cap[:, gap0 + i * t_frame : gap0 + (i + 1) * t_frame] = wave
    capture = jnp.asarray(cap).astype(jnp.bfloat16)
    del cap

    @jax.jit
    def run(capture):
        res = stream.receive_stream(
            cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16, lock=True
        )
        return res.carry.frames_ok.sum()

    ok = int(run(capture))
    nsteps = total_n // chunk
    dt = timeit(f"full lock stream ({nsteps} steps)", run, capture, iters=5)
    if dt:
        ms = batch * total_n / dt / 1e6
        print(
            f"LOCK STREAM: {ms:.0f} Msamples/s  frames_ok={ok/(batch*nframes):.3f}"
            f"  per-step {dt/nsteps*1e3:.1f} ms",
            flush=True,
        )

    @jax.jit
    def run_search(capture):
        res = stream.receive_stream(
            cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
        )
        return res.carry.frames_ok.sum()

    ok2 = int(run_search(capture))
    dt2 = timeit(f"full search stream ({nsteps} steps)", run_search, capture, iters=3)
    if dt2:
        ms2 = batch * total_n / dt2 / 1e6
        print(
            f"SEARCH STREAM: {ms2:.0f} Msamples/s  frames_ok={ok2/(batch*nframes):.3f}"
            f"  per-step {dt2/nsteps*1e3:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
