"""Pallas TPU kernels for the demod hot path.

The demodulator's inner loop is the tone-energy filterbank
(anet.dsp.demod.tone_energies): a [T, sps] x [sps, 2M] matmul followed by
square-and-add. The Pallas kernel fuses windowing, the matmul, and the
magnitude epilogue in VMEM, so the [T, 2M] I/Q intermediate never touches
HBM — the op moves exactly input-samples + output-energies.

The jnp path in anet.dsp.demod is the golden model; `tone_energies_fused`
is validated against it to tolerance in tests (interpret mode on CPU, real
Mosaic on TPU) and selected by `use_pallas=True` or the
ANET_BENCH_PALLAS env var in the benchmark harness.
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
    "SYMBOL_TILE",
    "TM_SYMBOL_TILE",
    "TM_LANE_TILE",
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
