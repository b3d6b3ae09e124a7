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

    from anet.utils.compilecache import enable as _cc

    _cc()  # persistent compile cache: warm re-runs through the tunnel
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
    # (bs=32 exceeds VMEM since the slab scratch double-buffered)
    for bs in (16,):
        got = demod_at_fused(cfg, small, sst, n_symbols, batch_tile=bs)
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(ref, got)
        )
        print(f"VALIDATE bs={bs} decisions equal: {same}", flush=True)

    for bs in (8, 16):
        f = jax.jit(
            lambda b, s, bs=bs: sum(
                x.sum()
                for x in demod_at_fused(cfg, b, s, n_symbols, batch_tile=bs)
            )
        )
        timeit(f"demod_at_fused bs={bs}", f, buf, starts)

    # --- stage isolation: same kernel but the slab is a STATIC slice ---
    # (decisions are garbage; only the timing matters). If this collapses
    # toward the iq-contraction cost, the one-hot row selection (its iota
    # compares + the batched [bs, p_rows, rows_total] x [bs, rows_total,
    # 128] matmul) is the dominant term and the dynamic-slice slab design
    # is the right replacement.
    import functools
    import math

    from jax.experimental import pallas as pl
    from anet.dsp.demod import demod_basis

    sps = cfg.samples_per_symbol
    m = cfg.num_tones
    r_syms = 128 // sps
    pre = cfg.preamble_symbols * sps
    x = buf
    b, length = x.shape
    rows_total = length // 128
    p = -(-n_symbols // r_syms)
    gran = 128 // math.gcd(128, r_syms)
    pp = -(-p // gran) * gran
    p_rows = pp + 8
    bs = 8
    xr = x.reshape(b, rows_total, 128)
    basis = demod_basis(cfg, dtype=jnp.float32)
    j0 = jnp.arange(128)
    blocks = []
    for u in range(r_syms):
        idx = j0 - u * sps
        ok = (idx >= 0) & (idx < sps)
        blocks.append(jnp.where(ok[:, None], basis[jnp.clip(idx, 0, sps - 1)], 0.0))
    bbase = jnp.concatenate(blocks, axis=1).astype(x.dtype)
    r2m = 2 * m * r_syms

    def _kern(start_ref, x_ref, bbase_ref, tone_ref, best_ref, total_ref):
        st0 = start_ref[...].astype(jnp.int32) + pre
        lo = jax.lax.rem(st0, 128).reshape(bs, 1, 1)
        slab = x_ref[:, :p_rows, :]  # STATIC rows — garbage, same shape
        j_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 256, 128), 1)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 256, 128), 2)
        sh = (c_io == j_io - lo).astype(bbase_ref.dtype)
        bgrp = jax.lax.dot_general(
            sh.reshape(bs * 256, 128), bbase_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(bbase_ref.dtype).reshape(bs, 256, r2m)
        iq = jax.lax.dot_general(
            slab[:, :pp, :], bgrp[:, :128, :],
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            slab[:, 1 : pp + 1, :], bgrp[:, 128:, :],
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )
        for u in range(r_syms):
            iqu = iq[:, :, u * 2 * m : (u + 1) * 2 * m]
            i_part = iqu[:, :, :m]
            q_part = iqu[:, :, m:]
            e = i_part * i_part + q_part * q_part
            tone_ref[:, u * pp : (u + 1) * pp] = jnp.argmax(e, -1).astype(jnp.int32)
            best_ref[:, u * pp : (u + 1) * pp] = jnp.max(e, -1)
            total_ref[:, u * pp : (u + 1) * pp] = jnp.sum(e, -1)

    st2 = starts.reshape(-1, 1)

    def run_static(xr, st2):
        return pl.pallas_call(
            _kern,
            out_shape=(
                jax.ShapeDtypeStruct((b, r_syms * pp), jnp.int32),
                jax.ShapeDtypeStruct((b, r_syms * pp), jnp.float32),
                jax.ShapeDtypeStruct((b, r_syms * pp), jnp.float32),
            ),
            grid=(b // bs,),
            in_specs=[
                pl.BlockSpec((bs, 1), lambda i: (i, 0)),
                pl.BlockSpec((bs, rows_total, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((128, r2m), lambda i: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((bs, r_syms * pp), lambda i: (i, 0)),
                pl.BlockSpec((bs, r_syms * pp), lambda i: (i, 0)),
                pl.BlockSpec((bs, r_syms * pp), lambda i: (i, 0)),
            ),
        )(st2, xr, bbase)

    f = jax.jit(lambda xr, st2: sum(x.sum() for x in run_static(xr, st2)))
    timeit("demod_at variant: STATIC slab (no one-hot row select)", f, xr, st2)

    # --- bisection of the REAL (DMA-span) kernel ------------------------
    # Two null results (batched contraction, shift-the-slab) proved the
    # kernel is neither dispatch- nor FLOP-bound; these variants switch
    # stages off one at a time to find where the ~19 ms actually lives.
    from jax.experimental.pallas import tpu as pltpu

    pv = -(-p // 8) * 8
    sv = (-(-(pv + 2) // 8)) * 8 + 8
    hi_max = (int(chunk) + pre) // 128
    pad_rows = max(0, hi_max + sv - rows_total)
    xp = xr
    rows_tot2 = rows_total
    if pad_rows:
        xp = jnp.pad(x, ((0, 0), (0, pad_rows * 128))).reshape(
            b, rows_total + pad_rows, 128
        )
        rows_tot2 = rows_total + pad_rows

    def _vkern(st_s, st_v, x_hbm, bbase_ref, tone_ref, best_ref, total_ref,
               slab_scr, sem, *, mode):
        i = pl.program_id(0)
        for s in range(bs):
            hi = (st_s[i * bs + s] + pre) // 128
            hi8 = pl.multiple_of((hi // 8) * 8, 8)
            pltpu.make_async_copy(
                x_hbm.at[i * bs + s, pl.ds(hi8, sv), :], slab_scr.at[s],
                sem.at[s],
            ).start()
        lo = jax.lax.rem(st_v[...].astype(jnp.int32) + pre, 128).reshape(bs, 1, 1)
        j_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 128, 128), 1)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 128, 128), 2)
        sh_lo = (j_io == c_io + lo).astype(bbase_ref.dtype)
        sh_hi = (j_io == c_io + lo - 128).astype(bbase_ref.dtype)
        for s in range(bs):
            hi = (st_s[i * bs + s] + pre) // 128
            hi8 = pl.multiple_of((hi // 8) * 8, 8)
            pltpu.make_async_copy(
                x_hbm.at[i * bs + s, pl.ds(hi8, sv), :], slab_scr.at[s],
                sem.at[s],
            ).wait()
        slab_all = slab_scr[...]
        if mode == "dma":
            t = jnp.sum(slab_all.astype(jnp.float32), axis=(1,))
            t = jnp.sum(t, axis=-1, keepdims=True)  # [bs, 1]
            tone_ref[...] = jnp.zeros((bs, r_syms * pp), jnp.int32)
            best_ref[...] = jnp.zeros((bs, r_syms * pp), jnp.float32)
            total_ref[...] = jnp.broadcast_to(t, (bs, r_syms * pp))
            return
        if mode == "noshift":
            srows = slab_all[:, :pv, :]
        else:
            shifted = (
                jax.lax.dot_general(
                    slab_all[:, : sv - 1, :], sh_lo,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    slab_all[:, 1:sv, :], sh_hi,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            ).astype(slab_all.dtype)
            deltav = jax.lax.rem(
                jax.lax.div(st_v[...].astype(jnp.int32) + pre, 128), 8
            ).reshape(bs, 1, 1)
            srows = jnp.zeros((bs, pv, 128), slab_all.dtype)
            for r in range(8):
                srows = jnp.where(deltav == r, shifted[:, r : r + pv, :], srows)
        iq = jax.lax.dot_general(
            srows.reshape(bs * pv, 128), bbase_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(bs, pv, r2m)
        if mode == "noepi":
            t = jnp.sum(iq, axis=-1)  # [bs, pv]
            tone_ref[...] = jnp.zeros((bs, r_syms * pp), jnp.int32)
            best_ref[...] = jnp.zeros((bs, r_syms * pp), jnp.float32)
            total_ref[:, :pv] = t
            total_ref[:, pv:] = jnp.zeros((bs, r_syms * pp - pv), jnp.float32)
            return
        for u in range(r_syms):
            iqu = iq[:, :, u * 2 * m : (u + 1) * 2 * m]
            i_part = iqu[:, :, :m]
            q_part = iqu[:, :, m:]
            e = i_part * i_part + q_part * q_part
            tone_ref[:, u * pp : u * pp + pv] = jnp.argmax(e, -1).astype(jnp.int32)
            best_ref[:, u * pp : u * pp + pv] = jnp.max(e, -1)
            total_ref[:, u * pp : u * pp + pv] = jnp.sum(e, -1)
            if pp > pv:
                tone_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                    (bs, pp - pv), jnp.int32)
                best_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                    (bs, pp - pv), jnp.float32)
                total_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                    (bs, pp - pv), jnp.float32)

    def run_variant(mode, xp, st, st2):
        return pl.pallas_call(
            functools.partial(_vkern, mode=mode),
            out_shape=(
                jax.ShapeDtypeStruct((b, r_syms * pp), jnp.int32),
                jax.ShapeDtypeStruct((b, r_syms * pp), jnp.float32),
                jax.ShapeDtypeStruct((b, r_syms * pp), jnp.float32),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b // bs,),
                in_specs=[
                    pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((128, r2m), lambda i, st: (0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((bs, r_syms * pp), lambda i, st: (i, 0)),
                    pl.BlockSpec((bs, r_syms * pp), lambda i, st: (i, 0)),
                    pl.BlockSpec((bs, r_syms * pp), lambda i, st: (i, 0)),
                ),
                scratch_shapes=[
                    pltpu.VMEM((bs, sv, 128), xp.dtype),
                    pltpu.SemaphoreType.DMA((bs,)),
                ],
            ),
        )(st, st2, xp, bbase)

    st1 = starts
    for mode in ("dma", "noshift", "noepi", "full"):
        f = jax.jit(
            lambda xp, st1, st2, mode=mode: sum(
                o.sum() for o in run_variant(mode, xp, st1, st2)
            )
        )
        timeit(f"demod_at bisect: {mode}", f, xp, st1, st2)

    # --- energies-epilogue split: kernel-only vs outside reduce ---------
    from anet.kernels import _demod_at_energies_kernel

    mr = m * r_syms
    bbase_e = jnp.concatenate(
        [blk_[:, :m] for blk_ in blocks] + [blk_[:, m:] for blk_ in blocks],
        axis=1,
    ).astype(x.dtype)

    def run_eall(xp, st, st2):
        return pl.pallas_call(
            functools.partial(
                _demod_at_energies_kernel,
                bs=bs, sv=sv, pv=pv, r_syms=r_syms, m=m, pre=pre,
                ncells=b // bs,
            ),
            out_shape=jax.ShapeDtypeStruct((b, pv, mr), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b // bs,),
                in_specs=[
                    pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((128, 2 * mr), lambda i, st: (0, 0)),
                ],
                out_specs=pl.BlockSpec((bs, pv, mr), lambda i, st: (i, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, bs, sv, 128), xp.dtype),
                    pltpu.SemaphoreType.DMA((2, bs)),
                ],
            ),
        )(st, st2, xp, bbase_e)

    timeit(
        "eall kernel only (sum e)",
        jax.jit(lambda xp, st1, st2: run_eall(xp, st1, st2).sum()),
        xp, st1, st2,
    )
    e_dev = jax.jit(run_eall)(xp, st1, st2)
    e_dev.block_until_ready()

    def red_reshape(e):
        e4 = e.reshape(b, pv, r_syms, m)
        return (
            jnp.argmax(e4, -1).astype(jnp.int32).sum()
            + jnp.max(e4, -1).sum()
            + jnp.sum(e4, -1).sum()
        )

    timeit("outside reduce: reshape [.,16,16]", jax.jit(red_reshape), e_dev)

    def red_flat(e):
        # stay 2-D: [b*pv, mr]; total via matmul, max/argmax via reshape
        e2 = e.reshape(b * pv, mr)
        smat = (
            jnp.arange(mr)[:, None] // m == jnp.arange(r_syms)[None, :]
        ).astype(jnp.float32)
        total = e2 @ smat  # [b*pv, r_syms]
        e4 = e2.reshape(b * pv, r_syms, m)
        return (
            jnp.argmax(e4, -1).astype(jnp.int32).sum()
            + jnp.max(e4, -1).sum()
            + total.sum()
        )

    timeit("outside reduce: matmul total + reshape maxes", jax.jit(red_flat), e_dev)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
