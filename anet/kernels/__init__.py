"""Pallas TPU kernels for the receiver hot paths.

Every kernel here exists to keep an intermediate OUT of HBM that the jnp
formulation materializes:

- ``decide_tones_tm`` — time-major fused filterbank + symbol decision;
  the [S, 2M, B] I/Q energies stay in VMEM (the production MFSK demod,
  95 Gsamples/s on a v5e — docs/PERF.md).
- ``viterbi_trellis`` — forward/traceback over the K=7 trellis with the
  [64, N] path metrics resident in VMEM across all ~2100 steps and the
  decisions bit-packed into int32 lane words (bit-exact vs the scan).
- ``correlate_fused`` — block-Toeplitz preamble correlation whose
  overlapped window tensor exists only in VMEM (shifted BlockSpec
  aliases), for the streaming receiver's sync search.
- ``tone_energies_fused`` / ``decide_tones_fused`` — the round-1
  batch-major variants, kept as validated alternates (plain XLA wins in
  that layout; `ANET_BENCH_PALLAS=1`).

The jnp formulations are the golden models: every kernel is validated
against them in interpret mode by the CPU test suite and through the
real Mosaic compiler by ``tools/tpu_validate.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anet.dsp.demod import demod_basis
from anet.dsp.params import ModemConfig

__all__ = [
    "tone_energies_fused",
    "decide_tones_fused",
    "decide_tones_tm",
    "viterbi_trellis",
    "SYMBOL_TILE",
    "TM_SYMBOL_TILE",
    "TM_LANE_TILE",
    "VIT_LANE_TILE",
]

SYMBOL_TILE = 512  # symbols per grid step; 512 x 64 f32 window tile = 128 KiB

# Time-major kernel tiling: SB symbols x Bt streams per grid step.
# 8 x 2048 puts a [512, 2048] bf16 window block (2 MiB) in VMEM.
TM_SYMBOL_TILE = 8
TM_LANE_TILE = 2048


def _energy_kernel(windows_ref, basis_ref, out_ref, *, num_tones: int):
    iq = jnp.dot(
        windows_ref[:], basis_ref[:], preferred_element_type=jnp.float32
    )  # [TS, 2M] — MXU
    i, q = iq[:, :num_tones], iq[:, num_tones:]
    out_ref[:] = i * i + q * q  # VPU epilogue, fused in VMEM


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("compute_dtype", "interpret")
)
def tone_energies_fused(
    config: ModemConfig,
    samples: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for anet.dsp.demod.tone_energies.

    Args:
      samples: float [..., S * samples_per_symbol].
    Returns:
      float32 [..., S, num_tones].
    """
    sps = config.samples_per_symbol
    m = config.num_tones
    s = samples.shape[-1] // sps
    batch_shape = samples.shape[:-1]

    # Flatten all symbols into one [T, sps] matrix; pad T to the tile size.
    windows = samples.reshape(-1, sps).astype(compute_dtype)
    t = windows.shape[0]
    t_pad = -t % SYMBOL_TILE
    if t_pad:
        windows = jnp.concatenate(
            [windows, jnp.zeros((t_pad, sps), compute_dtype)], axis=0
        )
    basis = demod_basis(config, dtype=compute_dtype)  # [sps, 2M]

    grid = ((t + t_pad) // SYMBOL_TILE,)
    out = pl.pallas_call(
        functools.partial(_energy_kernel, num_tones=m),
        out_shape=jax.ShapeDtypeStruct((t + t_pad, m), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (SYMBOL_TILE, sps),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (sps, 2 * m),
                    lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (SYMBOL_TILE, m),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (t + t_pad) * sps * 2 * m,
            bytes_accessed=(t + t_pad) * sps * windows.dtype.itemsize
            + (t + t_pad) * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(windows, basis)

    return out[:t].reshape(*batch_shape, s, m)


def _decide_kernel(windows_ref, basis_ref, tone_ref, best_ref, total_ref, *, num_tones: int):
    """Windows -> winning tone index + best/total energy, all in VMEM.

    The [TS, 2M] I/Q and [TS, M] energy intermediates never reach HBM:
    the kernel emits only the per-symbol decision and the two scalars the
    quality metrics need.
    """
    iq = jnp.dot(
        windows_ref[:], basis_ref[:], preferred_element_type=jnp.float32
    )
    i, q = iq[:, :num_tones], iq[:, num_tones:]
    e = i * i + q * q  # [TS, M]
    tone_ref[:] = jnp.argmax(e, axis=1, keepdims=True).astype(jnp.int32)
    best_ref[:] = jnp.max(e, axis=1, keepdims=True)
    total_ref[:] = jnp.sum(e, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("compute_dtype", "interpret")
)
def decide_tones_fused(
    config: ModemConfig,
    samples: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fully-fused symbol decision: waveform -> (tone, best_e, total_e).

    Returns int32 tones [..., S] plus float32 best/total energies [..., S]
    — everything the frame parser and quality metrics need, at 1/16th the
    output traffic of materializing full energies.
    """
    sps = config.samples_per_symbol
    m = config.num_tones
    s = samples.shape[-1] // sps
    batch_shape = samples.shape[:-1]

    windows = samples.reshape(-1, sps).astype(compute_dtype)
    t = windows.shape[0]
    t_pad = -t % SYMBOL_TILE
    if t_pad:
        windows = jnp.concatenate(
            [windows, jnp.zeros((t_pad, sps), compute_dtype)], axis=0
        )
    basis = demod_basis(config, dtype=compute_dtype)

    grid = ((t + t_pad) // SYMBOL_TILE,)
    tones, best, total = pl.pallas_call(
        functools.partial(_decide_kernel, num_tones=m),
        out_shape=(
            jax.ShapeDtypeStruct((t + t_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((t + t_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((t + t_pad, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((SYMBOL_TILE, sps), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((sps, 2 * m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SYMBOL_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SYMBOL_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SYMBOL_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (t + t_pad) * sps * 2 * m,
            bytes_accessed=(t + t_pad) * sps * windows.dtype.itemsize
            + (t + t_pad) * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(windows, basis)

    shape = batch_shape + (s,)
    return (
        tones[:t, 0].reshape(shape),
        best[:t, 0].reshape(shape),
        total[:t, 0].reshape(shape),
    )


def _decide_tm_kernel(
    basis_ref, w_ref, tone_ref, best_ref, total_ref, *, num_tones: int, sps: int, sb: int
):
    """Time-major fused decision: [SB*sps, Bt] window block in, per-symbol
    (tone, best, total) out, everything between in VMEM.

    Layout is the whole trick (and why this kernel WINS where the
    batch-major attempts in round 1 lost): streams live in the lane
    dimension, so the [2M, Bt] I/Q block keeps full 128-lane tiles, the
    argmax/max/sum run across SUBLANES (cheap VPU tree) instead of lanes,
    and the [S, sps] symbol split of the input is a major-dimension view —
    no lane relayout anywhere. Measured 95.5 Gsamples/s end-to-end via
    bench.py vs 59 for the best unfused time-major XLA form and 46.6 for
    the round-1 batch-major path (B=16384, mfsk16-fast): the [S, 2M, B]
    f32 I/Q intermediate (1.2 GB) never touches HBM, so the kernel runs
    at roughly the cost of reading the bf16 capture once (docs/PERF.md).
    """
    b = basis_ref[...]  # [2M, sps]
    for s in range(sb):
        w = w_ref[s * sps : (s + 1) * sps, :]  # [sps, Bt]
        iq = jax.lax.dot_general(
            b, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [2M, Bt] — MXU
        i, q = iq[:num_tones], iq[num_tones:]
        e = i * i + q * q  # [M, Bt]
        tone_ref[s, :] = jnp.argmax(e, axis=0).astype(jnp.int32)
        best_ref[s, :] = jnp.max(e, axis=0)
        total_ref[s, :] = jnp.sum(e, axis=0)


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("compute_dtype", "interpret")
)
def decide_tones_tm(
    config: ModemConfig,
    data_tm: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Time-major fused symbol decision.

    Args:
      data_tm: float [S * sps, B] — symbol-aligned data section with TIME
        leading and the stream batch in the minor (lane) dimension. This
        is the natural layout for multi-stream audio ingest (sample-
        interleaved) and the fast one on TPU: splitting time into symbols
        is then a major-dim reshape, free of lane relayouts.
    Returns:
      (tone int32 [S, B], best float32 [S, B], total float32 [S, B]).
    """
    sps = config.samples_per_symbol
    m = config.num_tones
    t, b = data_tm.shape
    s = t // sps
    sb = TM_SYMBOL_TILE
    s_pad = -s % sb
    # Lane tile: full TM_LANE_TILE when the batch allows, else the batch
    # itself padded up to a lane multiple (small/CPU cases).
    bt = TM_LANE_TILE if b >= TM_LANE_TILE else -(-b // 128) * 128
    b_pad = -b % bt
    w = data_tm[: s * sps].astype(compute_dtype)
    if s_pad or b_pad:
        w = jnp.pad(w, ((0, s_pad * sps), (0, b_pad)))
    sp, bp = s + s_pad, b + b_pad
    basis = demod_basis(config, dtype=compute_dtype).T  # [2M, sps]

    grid = (sp // sb, bp // bt)
    tone, best, total = pl.pallas_call(
        functools.partial(_decide_tm_kernel, num_tones=m, sps=sps, sb=sb),
        out_shape=(
            jax.ShapeDtypeStruct((sp, bp), jnp.int32),
            jax.ShapeDtypeStruct((sp, bp), jnp.float32),
            jax.ShapeDtypeStruct((sp, bp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * m, sps), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (sb * sps, bt), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec((sb, bt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((sb, bt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((sb, bt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * sp * sps * 2 * m * bp,
            bytes_accessed=sp * sps * bp * w.dtype.itemsize + sp * bp * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(basis, w)
    return tone[:s, :b], best[:s, :b], total[:s, :b]


# --- Viterbi trellis kernels -------------------------------------------------
#
# The convolutional decoder (anet.dsp.fec._viterbi) is a 2x ~2100-step
# sequential scan. The jnp formulation re-reads and re-writes the [64, N]
# path-metric array from HBM every step and materializes a [T, 64, N]
# decision tensor; these kernels keep the path metrics RESIDENT IN VMEM
# across the whole trellis (scratch persists across TPU grid steps, which
# run sequentially) and pack the 64 per-state decision bits into two
# int32 lane words — 8x less decision traffic, and the only HBM the
# forward pass touches per step is its [2, bt] soft input and [2, bt]
# packed output. The backward pass is pure [1, bt] integer arithmetic:
# the predecessor state is (s >> 1) | (j << 5) in closed form and the
# decision bit j comes out of the packed words with a variable shift —
# no gather instruction anywhere (see fec._viterbi's layout discussion).

VIT_LANE_TILE = 8192
VIT_STEP_TILE = 8  # trellis steps per grid iteration (amortizes grid overhead)
_VIT_STATES = 64  # 2**(K-1), K=7
_VIT_BIG = 1e9  # python scalar: a captured jnp constant would break kernel tracing


def _vit_fwd_kernel(sign_ref, perm_ref, pack_ref, rx_ref, take_ref, pm_ref, *, r_steps, t_total):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        rows = jax.lax.broadcasted_iota(jnp.int32, pm_ref.shape, 0)
        pm_ref[...] = jnp.where(rows == 0, 0.0, _VIT_BIG).astype(jnp.float32)

    s = sign_ref[...]  # [64, 4] — per-state +-1 branch-metric signs
    perm = perm_ref[...]  # [128, 64] one-hot: rows 0-63 pm[ns>>1], 64-127 pm[(ns>>1)|32]
    pack = pack_ref[...]  # [4, 64] bit weights 2^(s & 15) per 16-bit group
    half = _VIT_STATES // 2
    for r in range(r_steps):

        @pl.when(tb * r_steps + r < t_total)
        def _step(r=r):
            rx0 = rx_ref[r, 0:1, :]  # [1, bt]
            rx1 = rx_ref[r, 1:2, :]
            bm0 = s[:, 0:1] * rx0 + s[:, 1:2] * rx1  # [64, bt]
            bm1 = s[:, 2:3] * rx0 + s[:, 3:4] * rx1
            # pm[ns >> 1] and pm[(ns >> 1) | 32] via a one-hot MXU matmul:
            # a sublane interleave (jnp.repeat) measures ~4.5 ms per use
            # over the whole trellis on a v5e, while the 0/1 matmul rides
            # the MXU concurrently with the VPU and is EXACT in f32 with
            # HIGHEST precision (every product is 1.0*x or 0.0*x and the
            # bf16x3 split reconstructs f32 losslessly).
            # One-hot permute on the MXU, EXACT via a manual bf16x3
            # split (Mosaic lowers Precision.HIGHEST as six passes and
            # rejects HIGH; three DEFAULT passes suffice because f32
            # splits losslessly into three bf16 terms and every product
            # is 1.0*term or 0.0*term).
            pm = pm_ref[...]
            hi = pm.astype(jnp.bfloat16)
            r1 = pm - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            moved = (
                jax.lax.dot_general(
                    perm, hi, dims, preferred_element_type=jnp.float32
                )
                + jax.lax.dot_general(
                    perm, mid, dims, preferred_element_type=jnp.float32
                )
                + jax.lax.dot_general(
                    perm, lo, dims, preferred_element_type=jnp.float32
                )
            )  # [128, bt]
            cand0 = moved[:_VIT_STATES] + bm0
            cand1 = moved[_VIT_STATES:] + bm1
            takef = (cand1 < cand0).astype(jnp.float32)  # ties -> j=0
            # No per-step normalization: constants never change an argmin
            # and f32 holds the unnormalized metrics (see fec._viterbi).
            pm_ref[...] = jnp.minimum(cand0, cand1)
            # Pack the 64 decision bits into two int32 lane words, again
            # on the MXU: weights 2^(s & 15) sum each 16-state group into
            # an exact f32 integer < 2^16 (distinct powers of two never
            # carry), then two casts and a shift assemble each word.
            grp = jax.lax.dot_general(
                pack,
                takef,
                (((1,), (0,)), ((), ())),
                # exact even single-pass: 0/1 times a power of two, f32
                # accumulation of distinct powers never carries
                preferred_element_type=jnp.float32,
            )  # [4, bt] — 16-bit halves of the two words
            g = grp.astype(jnp.int32)
            take_ref[r, 0:1, :] = g[0:1] | jnp.left_shift(g[1:2], 16)
            take_ref[r, 1:2, :] = g[2:3] | jnp.left_shift(g[3:4], 16)


def _vit_bwd_kernel(take_ref, bits_ref, s_ref, *, r_steps, t_total, n_blocks):
    tb = pl.program_id(1)  # processes absolute block n_blocks - 1 - tb

    @pl.when(tb == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)  # tail-flushed: end in state 0

    blk = n_blocks - 1 - tb
    for r in reversed(range(r_steps)):

        @pl.when(blk * r_steps + r < t_total)
        def _step(r=r):
            s = s_ref[...]  # [1, bt] int32 — surviving state per stream
            word = jnp.where(s < 32, take_ref[r, 0:1, :], take_ref[r, 1:2, :])
            # arithmetic >> then & 1 extracts bit (s & 31) regardless of sign
            j = jnp.right_shift(word, s & 31) & 1
            bits_ref[r : r + 1, :] = s & 1
            s_ref[...] = jnp.right_shift(s, 1) | jnp.left_shift(j, 5)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_trellis(
    signs: jnp.ndarray, rx_tm: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """Fused forward + traceback over the 64-state rate-1/2 trellis.

    Args:
      signs: float32 [64, 4] — per-state branch-metric signs
        (-expected +-1 coded pair for j=0 then j=1 transitions).
      rx_tm: float32 [T, 2, N] — per-step signed soft pairs, time-major.
    Returns:
      int32 [T, N] decided input bits (data + tail), time-major.

    Grid layout: (lane tiles, step blocks) with VIT_STEP_TILE trellis
    steps per grid iteration; the trailing partial block is masked with
    pl.when so padded steps never touch the path metrics or the
    traceback state.
    """
    t_steps, _, n = rx_tm.shape
    rs = VIT_STEP_TILE
    bt = VIT_LANE_TILE if n >= VIT_LANE_TILE else -(-n // 128) * 128
    n_pad = -n % bt
    t_pad = -t_steps % rs
    if n_pad or t_pad:
        rx_tm = jnp.pad(rx_tm, ((0, t_pad), (0, 0), (0, n_pad)))
    np_ = n + n_pad
    tp = t_steps + t_pad
    n_blocks = tp // rs
    grid = (np_ // bt, n_blocks)
    ns = jnp.arange(_VIT_STATES, dtype=jnp.int32)
    src_rows = jnp.concatenate([ns >> 1, (ns >> 1) | (_VIT_STATES // 2)])
    perm = (src_rows[:, None] == ns[None, :]).astype(jnp.bfloat16)  # [128, 64]
    pack = jnp.where(
        (ns[None, :] >> 4) == jnp.arange(4, dtype=jnp.int32)[:, None],
        # exact powers of two via integer shift — jnp.exp2 is a ulp off
        # at 2^13/2^15, and the int32 truncation after the pack matmul
        # would turn that ulp into a borrowed low bit
        jnp.left_shift(1, ns & 15)[None, :].astype(jnp.float32),
        0.0,
    )  # [4, 64]
    packed = pl.pallas_call(
        functools.partial(_vit_fwd_kernel, r_steps=rs, t_total=t_steps),
        out_shape=jax.ShapeDtypeStruct((tp, 2, np_), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_VIT_STATES, 4), lambda i, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2 * _VIT_STATES, _VIT_STATES),
                lambda i, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, _VIT_STATES), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rs, 2, bt), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rs, 2, bt), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((_VIT_STATES, bt), jnp.float32)],
        interpret=interpret,
    )(signs, perm, pack, rx_tm)
    bits = pl.pallas_call(
        functools.partial(
            _vit_bwd_kernel, r_steps=rs, t_total=t_steps, n_blocks=n_blocks
        ),
        out_shape=jax.ShapeDtypeStruct((tp, np_), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rs, 2, bt),
                lambda i, t, nb=n_blocks: (nb - 1 - t, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rs, bt),
            lambda i, t, nb=n_blocks: (nb - 1 - t, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((1, bt), jnp.int32)],
        interpret=interpret,
    )(packed)
    return bits[:t_steps, :n]


# --- preamble correlation ----------------------------------------------------

COR_LAG_TILE = 512  # lags per grid cell (matches sync.py's block sweep winner)
COR_BATCH_TILE = 512  # streams per grid cell


def _corr_kernel(*refs, n_shift: int):
    """Block-Toeplitz correlation cell: the out block at lag tile t is
    the sum over n_shift shifted segment blocks times the matching
    template band.

    The jnp formulation materializes the overlapped [B, n_blocks, K+B-1]
    window tensor in HBM (2.7 GB at the bench size — assembly plus
    re-read measured ~3x the pure matmul cost); here the overlap is
    expressed as n_shift BlockSpec aliases of the same segment (2-D
    blocks whose column-block index is t + s), so the windows only ever
    exist in VMEM.
    """
    seg_refs = refs[:n_shift]
    tmat_ref, out_ref = refs[n_shift], refs[n_shift + 1]
    b = COR_LAG_TILE
    acc = None
    for s in range(n_shift):
        part = jax.lax.dot_general(
            seg_refs[s][...],
            tmat_ref[s * b : (s + 1) * b, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("out_len", "interpret"))
def correlate_fused(
    seg: jnp.ndarray,
    template: jnp.ndarray,
    out_len: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Valid-mode correlation [..., N] x [K] -> [..., out_len] (f32),
    out_len <= N - K + 1, computed tile-by-tile in VMEM (see _corr_kernel).

    Inputs are taken in their given dtype (bf16 on the chip's hot path);
    accumulation is always f32.
    """
    k = template.shape[-1]
    b, bt = COR_LAG_TILE, COR_BATCH_TILE
    batch_shape = seg.shape[:-1]
    x = seg.reshape(-1, seg.shape[-1])
    n_streams = x.shape[0]
    n_blocks = -(-out_len // b)
    w = k + b - 1
    n_shift = -(-w // b)  # shifted aliases per lag tile
    rows = n_blocks + n_shift
    pad_t = rows * b - x.shape[-1]
    if pad_t > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_t)))
    pad_b = -n_streams % bt
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
    xr = x[:, : rows * b]  # 2-D; lag-tile aliases are column-block shifts

    from anet.dsp.sync import banded_template

    tmat = banded_template(template, n_shift * b, b)

    grid = (xr.shape[0] // bt, n_blocks)
    in_specs = [
        pl.BlockSpec((bt, b), functools.partial(lambda s, i, t: (i, t + s), sh))
        for sh in range(n_shift)
    ] + [pl.BlockSpec((n_shift * b, b), lambda i, t: (0, 0))]
    out = pl.pallas_call(
        functools.partial(_corr_kernel, n_shift=n_shift),
        out_shape=jax.ShapeDtypeStruct((xr.shape[0], n_blocks * b), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, b), lambda i, t: (i, t)),
        interpret=interpret,
    )(*([xr] * n_shift), tmat)
    out = out[:n_streams, :out_len]
    return out.reshape(*batch_shape, out_len)
