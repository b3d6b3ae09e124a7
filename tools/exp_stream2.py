"""Round-3d stream levers, measured on the chip.

Three questions, each with a bench-geometry number attached:

1. PATHOLOGY CHECK — does demod_at_fused's per-call cost really scale
   with the SIZE of its ANY-space HBM operand when the in-call pad is
   provably zero (pre-padded buffers, fixed start_bound, identical
   starts/geometry)? The round-3c resident autopsy said yes (~+3.2 ms
   per extra 537 MB); if that run's buffers triggered _demod_at_setup's
   in-call jnp.pad fallback the conclusion is wrong and the
   capture-resident scan is salvageable.
2. IN-SCAN STAGE BISECTION of the steady-state lock step: scans of
   composed sub-steps (slide / +probe / +demod / full) over the real
   bench capture, so each stage's cost is measured WHERE IT RUNS (inside
   scan, carry threaded), not in isolation.
3. CHUNK = FRAME GEOMETRY — the lock step's per-step costs are ~fixed
   (one probe, one frame demod, one parse), so throughput should scale
   ~linearly with chunk_size up to its maximum (one frame per chunk:
   chunk = t_frame = 36352, a multiple of 128). Measure the full lock
   stream at both chunks.

Run in the background (never under a killable timeout — a killed TPU
claim wedges the remote pool):

    nohup python tools/exp_stream2.py > /tmp/exp_stream2.log 2>&1 &
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
    from anet.dsp.frame import data_symbols_for_payload
    from anet.kernels import demod_at_buffer_pad, demod_at_fused
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
    chunk = 32768
    t_frame = family.frame_samples(cfg, payload_len)
    n_symbols = data_symbols_for_payload(cfg, payload_len)
    rng = np.random.default_rng(0)

    # ---------------- 1. pathology check ----------------
    # identical starts/geometry; ONLY the operand length varies, and every
    # buffer is pre-padded so _demod_at_setup's pad_rows == 0 and lane
    # alignment holds exactly.
    starts = jnp.asarray(rng.integers(0, chunk, batch), jnp.int32)
    base_live = t_frame + chunk
    for extra_chunks in (0, 2, 6):
        live = base_live + extra_chunks * chunk
        pad = demod_at_buffer_pad(cfg, n_symbols, start_bound=chunk, live_length=live)
        L = live + pad
        buf = jnp.asarray(
            rng.normal(size=(batch, L)).astype(np.float32)
        ).astype(jnp.bfloat16)
        f = jax.jit(
            lambda b, s: sum(
                x.sum()
                for x in demod_at_fused(cfg, b, s, n_symbols, start_bound=chunk)
            )
        )
        gb = batch * L * 2 / 1e9
        timeit(f"demod_at_fused operand {gb:.2f} GB (live {live})", f, buf, starts)
        del buf

    # ---------------- 2. in-scan stage bisection ----------------
    payloads = jnp.asarray(
        rng.integers(0, 256, (batch, payload_len), dtype=np.uint8)
    )
    wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)

    def build_capture(ch):
        gap0, nframes = 1000, 6
        total_n = -(-(gap0 + nframes * t_frame) // ch) * ch
        cap = np.zeros((batch, total_n), np.float32)
        for i in range(nframes):
            cap[:, gap0 + i * t_frame : gap0 + (i + 1) * t_frame] = wave
        capture = jax.jit(lambda x: x.astype(jnp.bfloat16))(jnp.asarray(cap))
        capture.block_until_ready()
        return capture, total_n, nframes, gap0

    capture, total_n, nframes, gap0 = build_capture(chunk)
    nsteps = total_n // chunk

    from anet.dsp.sync import preamble_quality_probe

    _, template, _ = stream.family_geometry(cfg, payload_len, jnp.bfloat16)
    t_c = template
    t_energy = jnp.sum(t_c.astype(jnp.float32) ** 2)

    def warm(ch):
        c = stream.init_carry(cfg, ch, payload_len, (batch,), dtype=jnp.bfloat16)
        return c._replace(
            locked=jnp.ones((batch,), jnp.bool_),
            next_start=jnp.full((batch,), gap0, jnp.int32),
        )

    def scan_of(step_fn, ch, cap_arr):
        nch = cap_arr.shape[-1] // ch  # caller passes the [batch, nch, ch] view

        @jax.jit
        def run(capr):
            def body(c, i):
                chunk_i = jax.lax.dynamic_index_in_dim(
                    capr, i, axis=-2, keepdims=False
                )
                return step_fn(c, chunk_i)

            fc, outs = jax.lax.scan(body, warm(ch), jnp.arange(nch))
            return fc.frames_ok.sum() + jax.tree_util.tree_leaves(outs)[0].sum()

        return run

    # stage steps (mirror _find_candidate_locked's steady path)
    def step_slide(c, ch_arr):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch_arr, t_frame, 0)
        return c._replace(buffer=buffer, samples_seen=seen), seen.sum()

    def step_probe(c, ch_arr):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch_arr, t_frame, 0)
        length = t_frame + ch_arr.shape[-1]
        pred_idx = c.next_start - abs0
        probe_at = jnp.clip(pred_idx, 0, length - t_frame)
        q5, st0 = preamble_quality_probe(
            buffer, probe_at, t_c, t_energy, n_lags=stream.PROBE_LAGS,
            compute_dtype=jnp.bfloat16, start_bound=length - t_frame,
        )
        nxt = jnp.where(jnp.max(q5, -1) >= 0.45, c.next_start + t_frame, c.next_start)
        return (
            c._replace(buffer=buffer, samples_seen=seen, next_start=nxt),
            q5.sum(),
        )

    def step_demod(c, ch_arr):
        buffer, seen, w0, abs0 = stream._slide_buffer(c, ch_arr, t_frame, 0)
        length = t_frame + ch_arr.shape[-1]
        pred_idx = c.next_start - abs0
        probe_at = jnp.clip(pred_idx, 0, length - t_frame)
        q5, st0 = preamble_quality_probe(
            buffer, probe_at, t_c, t_energy, n_lags=stream.PROBE_LAGS,
            compute_dtype=jnp.bfloat16, start_bound=length - t_frame,
        )
        # clip: pred_idx clipping at the window edge can push st0+argmax up
        # to the probe lag span past the declared bound
        start_idx = jnp.clip(
            st0 + jnp.argmax(q5, -1).astype(jnp.int32), 0, ch_arr.shape[-1]
        )
        tone, best, total = demod_at_fused(
            cfg, buffer, start_idx, n_symbols, start_bound=ch_arr.shape[-1]
        )
        nxt = jnp.where(jnp.max(q5, -1) >= 0.45, c.next_start + t_frame, c.next_start)
        return (
            c._replace(buffer=buffer, samples_seen=seen, next_start=nxt),
            tone.sum() + best.sum() + total.sum(),
        )

    def step_full(c, ch_arr):
        nc, out = stream.stream_step(
            cfg, c, ch_arr, payload_len, compute_dtype=jnp.bfloat16, lock=True
        )
        return nc, out.quality.sum()

    for label, fn in (
        ("scan slide", step_slide),
        ("scan slide+probe", step_probe),
        ("scan slide+probe+demod", step_demod),
        ("scan full lock step", step_full),
    ):
        dt = timeit(
            label,
            scan_of(fn, chunk, capture),
            capture.reshape(batch, nsteps, chunk),
            iters=6,
        )
        if dt:
            print(f"  -> {dt/nsteps*1e3:.2f} ms/step", flush=True)

    # ---------------- 3. chunk = t_frame geometry ----------------
    for ch in (chunk, t_frame):
        capture2, total2, nf2, _ = build_capture(ch)

        @jax.jit
        def run(cap_arr, ch=ch):
            res = stream.receive_stream(
                cfg, cap_arr, ch, payload_len, compute_dtype=jnp.bfloat16,
                lock=True, carry=warm(ch), resident=False,
            )
            return res.carry.frames_ok.sum()

        ok = int(run(capture2))
        dt = timeit(f"full lock stream chunk={ch}", run, capture2, iters=6)
        if dt:
            ms = batch * total2 / dt / 1e6
            print(
                f"  -> {ms:.0f} Msamples/s  frames_ok={ok/(batch*nf2):.3f}"
                f"  per-step {dt/(total2//ch)*1e3:.2f} ms",
                flush=True,
            )
        del capture2

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
