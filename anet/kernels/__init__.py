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

__all__ = ["tone_energies_fused", "decide_tones_fused", "SYMBOL_TILE"]

SYMBOL_TILE = 512  # symbols per grid step; 512 x 64 f32 window tile = 128 KiB


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
