"""Round-3 Viterbi forward-kernel experiments on the chip.

VERDICT round 2, item 7: the forward pass measured 30 ms at B=16384
against a ~17 ms VPU+MXU bound — and ~17 ms of the measured time is
attributable to the 3-pass one-hot permute matmuls (1.7 TFLOP over the
trellis). The rotating-label kernel removes them; this script validates
bit-exactness on real Mosaic and times the kernel vs the jnp scan.

Run in the background (never under a killable timeout — a killed TPU
claim wedges the remote pool):

    nohup python tools/exp_vit.py > /tmp/exp_vit.log 2>&1 &
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

    from anet.dsp import fec
    from anet.dsp.fec import _branch_signs, conv_encode
    from anet.kernels import viterbi_trellis

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # --- bit-exactness vs the jnp scan, through real Mosaic ---
    nbits = 300
    bits = jnp.asarray(rng.integers(0, 2, (256, nbits), dtype=np.uint8))
    coded = conv_encode(bits)
    flips = (
        jnp.asarray(rng.random(coded.shape) < 0.02).astype(jnp.uint8)
    )
    rx = (coded ^ flips).astype(jnp.float32) * 2.0 - 1.0
    got = fec._viterbi(rx, nbits, use_pallas=True)
    ref = fec._viterbi(rx, nbits, use_pallas=False)
    exact = bool(jnp.all(got == ref))
    dec_ok = bool(jnp.all(got == bits))
    print(f"VALIDATE viterbi kernel vs scan exact={exact} decoded_ok={dec_ok}", flush=True)

    # odd total (t_total % VIT_STEP_TILE != 0) to exercise the mask
    nbits2 = 500
    bits2 = jnp.asarray(rng.integers(0, 2, (128, nbits2), dtype=np.uint8))
    rx2 = conv_encode(bits2).astype(jnp.float32) * 2.0 - 1.0
    got2 = fec._viterbi(rx2, nbits2, use_pallas=True)
    ref2 = fec._viterbi(rx2, nbits2, use_pallas=False)
    print("VALIDATE odd-length exact:", bool(jnp.all(got2 == ref2)), flush=True)

    # --- forward+traceback timing at bench size ---
    # mfsk4-coded 256-byte frames: ~2100 coded pairs
    total = 2100
    for B in (4096, 16384):
        rx_tm = jnp.asarray(
            rng.normal(size=(total, 2, B)).astype(np.float32)
        )
        signs = jnp.asarray(_branch_signs())
        f = jax.jit(lambda s, r: viterbi_trellis(s, r).sum())
        timeit(f"viterbi_trellis fwd+bwd B={B} T={total}", f, signs, rx_tm)

    # --- end-to-end coded model ---
    import os

    os.environ.setdefault("ANET_BENCH_MODEL", "mfsk4-coded")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
