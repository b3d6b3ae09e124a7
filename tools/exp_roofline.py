"""Round-3 roofline probes: what are this chip's REAL ceilings?

VERDICT round 2 flagged that both hot kernels sit at ~25-30% of the
v5e's nominal peaks (197 TFLOP/s bf16, 819 GB/s HBM) — either most of
each iteration is outside the kernel, or the effective ceilings through
this remote tunnel are lower than nominal. Measure the ceilings
directly with ops that are unambiguously MXU-bound / HBM-bound, then
sweep the correlator's tiling against them.

Run in the background (never under a killable timeout — a killed TPU
claim wedges the remote pool):

    nohup python tools/exp_roofline.py > /tmp/exp_roofline.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(label, fn, *args, iters=10, extra=""):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms {extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    import jax

    from anet.utils.compilecache import enable as _cc

    _cc()  # persistent compile cache: warm re-runs through the tunnel
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    print("device:", jax.devices()[0], flush=True)
    d = jax.devices()[0]
    for attr in ("device_kind", "platform_version", "memory_stats"):
        try:
            v = getattr(d, attr)
            v = v() if callable(v) else v
            print(f"  {attr}: {v}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {attr}: n/a ({type(e).__name__})", flush=True)

    rng = np.random.default_rng(0)

    # --- 1. MXU ceiling: big square bf16 matmul, f32 accumulation ---
    for n in (4096, 8192):
        a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        f = jax.jit(
            lambda a, b: jnp.sum(
                jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        )
        dt = timeit(f"matmul bf16 {n}x{n}x{n}", f, a, b)
        if dt:
            print(f"  -> {2 * n**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    # --- 2. HBM ceiling: elementwise copy-scale of a big array ---
    for mb in (512, 2048):
        n = mb * 2**20 // 4
        x = jnp.asarray(rng.normal(size=n).astype(np.float32))
        f = jax.jit(lambda x: (x * 1.0000001).sum())
        dt = timeit(f"stream f32 {mb} MB (r+reduce)", f, x)
        if dt:
            print(f"  -> {mb / 1024 / dt:.0f} GB/s read", flush=True)
        # copy probe: force the scaled copy to MATERIALIZE in HBM with an
        # optimization barrier, then reduce on device — returning the
        # array would time the 2 GB device->host transfer through the
        # tunnel (measured: ~20 s!), and without the barrier XLA fuses
        # the multiply into the reduce and never writes at all.
        g = jax.jit(
            lambda x: jax.lax.optimization_barrier(x * 1.0000001).sum()
        )
        dt = timeit(f"copy f32 {mb} MB (r+w+r via barrier)", g, x)
        if dt:
            print(f"  -> {3 * mb / 1024 / dt:.0f} GB/s r+w+r", flush=True)

    # --- 3. The correlator's exact matmul shape, pure XLA (no pallas) ---
    # [B, 2560] x [2560, 512] repeated over lag tiles == the corr compute
    # without any windowing overlap. Gives the MXU bound for ITS shape.
    B = 8192
    lhs = jnp.asarray(rng.normal(size=(B, 2560)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    rhsm = jnp.asarray(rng.normal(size=(2560, 512)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    f = jax.jit(
        lambda l, r: sum(
            jnp.sum(
                jax.lax.dot_general(
                    l, r, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            for _ in range(64)
        )
    )
    dt = timeit("corr-shape 64x [8192,2560]x[2560,512]", f, lhs, rhsm)
    if dt:
        fl = 64 * 2 * B * 2560 * 512
        print(f"  -> {fl / dt / 1e12:.1f} TFLOP/s", flush=True)

    # --- 4. Correlator sweep: batch_tile x cell_tiles ---
    from anet.dsp.family import frame_samples, preamble_template
    from anet.kernels import correlate_fused
    from anet.models import get_model

    cfg = get_model("mfsk16-fast").config
    tmpl = preamble_template(cfg).astype(jnp.bfloat16)
    k = tmpl.shape[-1]
    chunk = 32768
    seg = jnp.asarray(
        rng.normal(size=(B, chunk + k - 1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    for bts in (128, 256, 512):
        for g in (2, 4, 8, 16):
            f = jax.jit(
                lambda x, bts=bts, g=g: correlate_fused(
                    x, tmpl, chunk, batch_tile=bts, cell_tiles=g
                ).sum()
            )
            timeit(f"corr bts={bts} g={g}", f, seg)

    # --- 5. Profiler trace of one aligned-demod bench iteration + one
    # correlator call, to see kernel vs dispatch time ---
    import glob

    from anet.dsp.family import transmit_fn
    from anet.kernels import decide_tones_tm

    payloads = jnp.asarray(
        rng.integers(0, 256, (256, 256), dtype=np.uint8)
    )
    wave = jax.jit(transmit_fn(cfg))(payloads)  # [256, T]
    t_frame = wave.shape[-1]
    big = jnp.tile(wave.T.astype(jnp.bfloat16), (1, 64))  # [T, 16384]
    f_demod = jax.jit(
        lambda x: decide_tones_tm(cfg, x)[0].sum()
    )
    f_corr = jax.jit(lambda x: correlate_fused(x, tmpl, chunk).sum())
    print("demod input", big.shape, flush=True)
    timeit("decide_tones_tm B=16384 (pre-trace)", f_demod, big)
    with jax.profiler.trace("/tmp/jaxtrace"):
        for _ in range(3):
            _ = np.asarray(f_demod(big))
        for _ in range(3):
            _ = np.asarray(f_corr(seg))
    files = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)
    print("trace files:", files, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
