"""Round-4: measure the OFDM fused track kernel on the chip.

Round 3 built + validated ofdm_track_decide_fused (golden equal across
QPSK/16/64-QAM, real-Mosaic checked by tools/tpu_validate.py) and wired
it into demodulate_frame's auto-dispatch — but never measured it. This
pins the number the round-2 target (tracked ofdm-fast >= 18 Gsamp/s at
B=16384) asked for: the full aligned receiver with the kernel ON vs the
jnp tracker path, tracked and untracked, plus the streaming entry.

Run in the background (never under a killable timeout — a killed TPU
claim wedges the remote pool):

    nohup python tools/exp_ofdm2.py > /tmp/exp_ofdm2.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=10, samples=None):
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
        print(f"{label}: {dt*1e3:.2f} ms{extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    import jax

    from anet.utils.compilecache import enable as _cc

    _cc()
    import jax.numpy as jnp

    from anet.dsp import family, ofdm
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    # throwaway first measurement: the FIRST timed loop of a fresh
    # process through the tunnel reports 100-3000x the true time (lazy
    # pool init lands inside it — docs/PERF.md sharp edge #7)
    import jax.numpy as _jnp
    timeit("warmup (discard)", jax.jit(lambda x: (x @ x).sum()),
           _jnp.ones((1024, 1024), _jnp.bfloat16), iters=3)
    cfg = get_model("ofdm-fast").config
    payload_len = 256
    batch = int(os.environ.get("EXP_BATCH", "16384"))
    t_frame = family.frame_samples(cfg, payload_len)
    rng = np.random.default_rng(0)

    distinct = 64
    payloads = jnp.asarray(
        rng.integers(0, 256, (distinct, payload_len), dtype=np.uint8)
    )
    tx = jax.jit(family.transmit_fn(cfg))
    wave64 = tx(payloads)
    waves = jax.jit(lambda w: jnp.tile(w, (batch // distinct, 1)))(wave64)
    waves.block_until_ready()
    samples = batch * t_frame

    import anet.dsp.ofdm as O

    real_flag = O._use_fused_track

    import dataclasses

    def with_tracking(c, flag):
        if dataclasses.is_dataclass(c):
            return dataclasses.replace(c, clock_tracking=flag)
        return c._replace(clock_tracking=flag)

    for track in (True, False):
        tcfg = cfg if track == cfg.clock_tracking else with_tracking(cfg, track)
        for fused in (True, False):
            O._use_fused_track = lambda fused=fused: fused

            @jax.jit
            def step(w, tcfg=tcfg):
                r = O.demodulate_frame(tcfg, w, payload_len)
                return jnp.sum(r.ok.astype(jnp.int32))

            ok = None
            def run(w, step=step):
                return step(w)

            dt = timeit(
                f"aligned ofdm-fast B={batch} track={track} fused={fused}",
                run, waves, iters=20, samples=samples,
            )
            if dt is not None:
                ok = int(step(waves))
                print(f"  frames_ok = {ok}/{batch}", flush=True)
    O._use_fused_track = real_flag
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
