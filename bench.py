"""anet benchmark: aggregate demod throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N, ...}

Headline: Msamples/s of audio demodulated through the full frame receiver
(tone-energy filterbank -> symbol decisions -> Gray decode -> byte packing
-> magic/length/CRC verification) on one chip, batched over independent
streams. `extra_metrics` carries a second number measured the same way:
`stream_throughput_per_chip`, the full *streaming* receive path — preamble
matched-filter search + chunked-scan demod (anet.stream) — i.e. the
production pipeline including synchronization, not just the aligned stage.

Baseline: the reference system's steady-state throughput is its real-time
operating point — 96 ksamples/s (48 kHz stereo, playback.cpp:9) per
receiver, paced to 1x real time by design (MulticastAudioOutput.kt:79-86).
vs_baseline is the speedup over that 0.096 Msamples/s envelope.

Usage: python bench.py                   (default backend — TPU)
       ANET_BENCH_CPU=1 python bench.py  (force CPU, for debugging)

Robustness: the TPU here sits behind a remote tunnel that can wedge; the
top-level entry runs the measurement in a watchdogged subprocess and falls
back to a CPU measurement (flagged in `details.backend`) rather than
hanging the caller.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_MSAMPLES_S = 0.096  # reference steady-state, derived in BASELINE.md
WATCHDOG_S = float(os.environ.get("ANET_BENCH_WATCHDOG_S", "600"))


def measure_stream(cfg, payload_len: int) -> dict:
    """Full streaming receive path on this backend: preamble search
    (block-Toeplitz matmul correlator) + chunked-scan demod, batched over
    independent streams. This is the production path — the reference's
    socket->queue->decode loop (network.cpp:409-430 -> playback.cpp:80-143)
    — not just the aligned-demod stage."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anet import stream
    from anet.dsp import family

    on_cpu = jax.default_backend() == "cpu"
    batch = int(os.environ.get("ANET_BENCH_STREAM_BATCH", "64" if on_cpu else "8192"))
    chunk = int(os.environ.get("ANET_BENCH_STREAM_CHUNK", "32768"))
    t_frame = family.frame_samples(cfg, payload_len)
    chunk = min(chunk, t_frame)  # chunk <= frame: no frame can be skipped

    rng = np.random.default_rng(0)
    payloads = jnp.asarray(
        rng.integers(0, 256, (batch, payload_len), dtype=np.uint8)
    )
    wave = np.asarray(jax.jit(family.transmit_fn(cfg))(payloads), np.float32)
    gap = 1000
    nframes = 3
    per = gap + t_frame
    total = -(-(nframes * per) // chunk) * chunk
    cap = np.zeros((batch, total), np.float32)
    for i in range(nframes):
        cap[:, i * per + gap : i * per + gap + t_frame] = wave
    capture = jnp.asarray(cap)

    @jax.jit
    def run(capture):
        res = stream.receive_stream(
            cfg, capture, chunk, payload_len, compute_dtype=jnp.bfloat16
        )
        return res.carry.frames_ok.sum()

    int(run(capture))  # warmup/compile
    iters = int(os.environ.get("ANET_BENCH_STREAM_ITERS", "2" if on_cpu else "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        ok = run(capture)
    ok_count = int(ok)  # device->host read, see module docstring
    dt = time.perf_counter() - t0
    msamples_s = batch * total * iters / dt / 1e6
    return {
        "metric": "stream_throughput_per_chip",
        "value": round(msamples_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 1),
        "details": {
            "batch_streams": batch,
            "chunk_size": chunk,
            "capture_samples": total,
            "frames_per_stream": nframes,
            "iters": iters,
            "seconds": round(dt, 4),
            "frames_ok_fraction": ok_count / (batch * nframes),
        },
    }


def main() -> None:
    import jax

    if os.environ.get("ANET_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from anet.dsp import family
    from anet.dsp.frame import demodulate_frame
    from anet.models import get_model

    backend = jax.default_backend()
    # Layouts: "tm" (default for MFSK) demodulates TIME-MAJOR [T, B] input
    # — the natural layout for sample-interleaved multi-stream ingest —
    # through the fused Pallas kernel (anet.kernels.decide_tones_tm):
    # measured ~2x the batch-major path on a v5e (the [B,S,sps] symbol
    # split's lane relayout and the I/Q HBM round-trip both vanish; see
    # docs/PERF.md). "bm" forces the round-1 batch-major path;
    # ANET_BENCH_PALLAS=1 selects the batch-major fused kernel with it.
    use_pallas = bool(os.environ.get("ANET_BENCH_PALLAS"))

    model = os.environ.get("ANET_BENCH_MODEL", "mfsk16-fast")
    cfg = get_model(model).config
    layout = os.environ.get("ANET_BENCH_LAYOUT", "tm")
    if family.is_ofdm(cfg) and layout != "bm":
        if "ANET_BENCH_LAYOUT" in os.environ:
            print("OFDM benches batch-major (the tm twin measures ~equal; "
                  "see docs/PERF.md); ignoring ANET_BENCH_LAYOUT", file=sys.stderr)
        layout = "bm"
    payload_len = int(os.environ.get("ANET_BENCH_PAYLOAD", "256"))
    # 16384 streams ~fills the v5e MXU pipeline (45+ Gsamples/s vs ~35 at
    # 4096) while keeping the input under 2.5 GB of HBM; 32768 adds only
    # ~2% more for twice the footprint.
    batch = int(os.environ.get("ANET_BENCH_BATCH", "16384"))
    t_frame = family.frame_samples(cfg, payload_len)

    # Build one batch of frames host-side (not timed).
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, (batch, payload_len), dtype=np.uint8))
    tx = family.transmit_fn(cfg)
    waves = jax.jit(tx)(payloads)
    if not family.is_ofdm(cfg):
        waves = waves.astype(jnp.bfloat16)
    if layout == "tm":
        waves = jax.jit(lambda x: x.T)(waves)  # one-time ingest layout, not timed
    waves.block_until_ready()

    if use_pallas and family.is_ofdm(cfg):
        print(
            "ANET_BENCH_PALLAS has no effect on OFDM models; running the XLA path",
            file=sys.stderr,
        )
        use_pallas = False
    uses_kernel = False
    if layout == "tm":
        from anet.dsp.frame import demodulate_frame_tm

        # auto-dispatch: fused Pallas kernel on TPU, jnp path elsewhere;
        # coded configs take the jnp tm path regardless (soft LLRs need
        # full energies)
        uses_kernel = (
            jax.default_backend() == "tpu"
            and getattr(cfg, "fec", "none") == "none"
        )
        demod = lambda w: demodulate_frame_tm(
            cfg, w, payload_len, compute_dtype=jnp.bfloat16
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

    # Warmup / compile.
    int(step(waves))

    iters = int(os.environ.get("ANET_BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(waves)
    # Force a device->host read of the result: block_until_ready alone can
    # under-report on remote-proxy backends where dispatch is fully async.
    ok_count = int(out)
    dt = time.perf_counter() - t0

    ok_frac = ok_count / batch
    samples = batch * t_frame * iters
    msamples_s = samples / dt / 1e6

    record = {
        "metric": "demod_throughput_per_chip",
        "value": round(msamples_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 1),
        "details": {
            "backend": backend,
            "layout": layout,
            "pallas": use_pallas or uses_kernel,
            "batch_streams": batch,
            "payload_bytes": payload_len,
            "frame_samples": t_frame,
            "iters": iters,
            "seconds": round(dt, 4),
            "frames_ok_fraction": ok_frac,
            "modem": model,
        },
    }
    # Second metric: the full streaming receive path (sync + scan), the
    # number round 1 lacked. Skippable for quick aligned-only runs.
    if not os.environ.get("ANET_BENCH_NO_STREAM"):
        record["extra_metrics"] = [measure_stream(cfg, payload_len)]
    print(json.dumps(record))


def main_with_watchdog() -> None:
    """Run the measurement in a subprocess; on hang/crash, fall back to CPU."""
    env = dict(os.environ, ANET_BENCH_INNER="1")
    for attempt_env, label in ((env, "primary"), ({**env, "ANET_BENCH_CPU": "1"}, "cpu-fallback")):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=attempt_env,
                capture_output=True,
                text=True,
                timeout=WATCHDOG_S,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench {label} attempt exceeded {WATCHDOG_S}s watchdog",
                file=sys.stderr,
            )
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        print(
            f"bench {label} attempt produced no result "
            f"(rc={proc.returncode}): {proc.stderr[-400:]}",
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
