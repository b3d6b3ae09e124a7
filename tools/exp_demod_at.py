"""Round-3 demod_at_fused tile sweep + stage isolation on the chip.

The fused align+demod is the lock-mode stream step's dominant cost
(~25.5 ms at B=8192); its FLOP count (~0.5 TFLOP bf16 incl. the one-hot
row-selection matmul) prices well under that, so the residual is either
grid/dispatch overhead (1024 cells at bs=8) or the batched-dot lowering.
Sweep the stream tile, then time a selection-only variant to split the
cost.

Run in the background (never under a killable timeout — a killed TPU
claim wedges the remote pool):

    nohup python tools/exp_demod_at.py > /tmp/exp_demod_at.log 2>&1 &
"""

from __future__ import annotations

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
    import jax.numpy as jnp

    from anet.dsp import family
    from anet.dsp.frame import data_symbols_for_payload
    from anet.kernels import demod_at_fused
    from anet.models import get_model

    print("backend:", jax.default_backend(), flush=True)
    cfg = get_model("mfsk16-fast").config
    payload_len = 256
    batch = 8192
    chunk = 32768
    t_frame = family.frame_samples(cfg, payload_len)
    n_symbols = data_symbols_for_payload(cfg, payload_len)
    L = t_frame + chunk
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.normal(size=(batch, L)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    starts = jnp.asarray(rng.integers(0, chunk, batch), jnp.int32)

    # correctness at one alternate tile
    small = buf[:256]
    sst = starts[:256]
    ref = demod_at_fused(cfg, small, sst, n_symbols)
    for bs in (16, 32):
        got = demod_at_fused(cfg, small, sst, n_symbols, batch_tile=bs)
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(ref, got)
        )
        print(f"VALIDATE bs={bs} decisions equal: {same}", flush=True)

    for bs in (8, 16, 32, 64):
        f = jax.jit(
            lambda b, s, bs=bs: sum(
                x.sum()
                for x in demod_at_fused(cfg, b, s, n_symbols, batch_tile=bs)
            )
        )
        timeit(f"demod_at_fused bs={bs}", f, buf, starts)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
