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
import math
import os

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
    "decide_frame_tm",
    "demod_at_fused",
    "demod_at_energies_fused",
    "demod_at_buffer_pad",
    "demod_probe_fused",
    "ofdm_track_decide_fused",
    "viterbi_trellis",
    "correlate_fused",
    "gather_rows_fused",
    "probe_at_fused",
    "sync_search_fused",
    "sync_search_blockmax",
    "SYMBOL_TILE",
    "TM_SYMBOL_TILE",
    "TM_LANE_TILE",
    "VIT_LANE_TILE",
]

SYMBOL_TILE = 512  # symbols per grid step; 512 x 64 f32 window tile = 128 KiB


def _acc_dtype(dtype):
    """MXU accumulator dtype for a given operand dtype: int8 operands
    accumulate in int32 (the int8 x int8 -> int32 systolic path — f32
    accumulation of integer dots is not a TPU matmul mode); float
    operands accumulate in f32 via preferred_element_type."""
    return jnp.int32 if jnp.dtype(dtype) == jnp.int8 else jnp.float32

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


def _decide_frame_tm_kernel(
    basis_ref,
    p_ref,
    w_ref,
    words_ref,
    crc_ref,
    qual_ref,
    bits_scr,
    words8_scr,
    data_scr,
    *,
    num_tones: int,
    sps: int,
    sb: int,
    bps: int,
    n_tiles: int,
):
    """decide_tones_tm's body plus the FRAME-PARSE EPILOGUE fused in.

    Per [sb symbols x Bt streams] tile: the filterbank matmul + decision
    exactly as _decide_tm_kernel, then in the tail
    - Gray-decode and bit-pack the sb decisions into ONE int32 word per
      stream (words out: [n_tiles, B] — 1/24th of the decisions form's
      three [S, B] outputs),
    - accumulate both CRC checksums as f32 bit-count partial sums
      (CRC-32 is linear over GF(2): crc = (bits @ P) mod 2 ^ const —
      fec._crc32_matmul; the P slab rows for this tile's bits arrive via
      the i-indexed BlockSpec, zero outside each checksum's byte range),
    - accumulate the quality sums (conf = best/total per symbol, best,
      total) the downstream metrics divide by S.

    The symbol-tile grid axis is INNERMOST so the crc/qual output blocks
    stay resident in VMEM across the whole accumulation for one lane
    tile (standard Pallas reduction pattern: init at i == 0, emit last).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        crc_ref[...] = jnp.zeros_like(crc_ref)
        qual_ref[...] = jnp.zeros_like(qual_ref)

    b = basis_ref[...]  # [2M, sps]
    int8_in = b.dtype == jnp.int8
    conf_acc = jnp.zeros((words_ref.shape[-1],), jnp.float32)
    best_acc = jnp.zeros_like(conf_acc)
    total_acc = jnp.zeros_like(conf_acc)
    word = jnp.zeros(words_ref.shape[-1], jnp.int32)
    for s in range(sb):
        w = w_ref[s * sps : (s + 1) * sps, :]  # [sps, Bt]
        if int8_in:
            # int8 x int8 -> int32 MXU path (the round-5 quantized-ingest
            # experiment: halves the kernel's mandatory HBM read). The
            # int32 I/Q is cast to f32 BEFORE squaring — squared int32
            # sums overflow (|iq| <= sps*127^2 ~ 1e6; its square ~1e12).
            # Energies then carry the (127*scale)^2 factor uniformly:
            # argmax decisions and the conf/snr RATIOS are invariant.
            iq = jax.lax.dot_general(
                b, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            iq = jax.lax.dot_general(
                b, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2M, Bt]
        ii, q = iq[:num_tones], iq[num_tones:]
        e = ii * ii + q * q  # [M, Bt]
        tone = jnp.argmax(e, axis=0).astype(jnp.int32)  # [Bt]
        best = jnp.max(e, axis=0)
        total = jnp.sum(e, axis=0)
        # Gray -> binary (bits.gray_decode, unrolled: bps <= 4 here)
        data = tone
        shift = 1
        while shift < bps:
            data = data ^ (data >> shift)
            shift <<= 1
        word = word | (data << ((sb - 1 - s) * bps))
        data_scr[s, :] = data
        conf_acc = conf_acc + best / jnp.maximum(total, 1e-20)
        best_acc = best_acc + best
        total_acc = total_acc + total
    # bits in BIT-MAJOR row order (row k*sb + s = bit k of symbol s): 4
    # [sb, Bt] stores instead of 32 sublane-1 stores — the P slab rows
    # are permuted to match host-side (_frame_crc_tables)
    dall = data_scr[...]
    for k in range(bps):
        bits_scr[k * sb : (k + 1) * sb, :] = (
            (dall >> (bps - 1 - k)) & 1
        ).astype(jnp.float32)
    # words land in an 8-row scratch (row i % 8 by masked write — Mosaic
    # rejects sublane-1 output blocks and dynamic sublane stores) that
    # shadows the (8, Bt) output block; the block flushes when its index
    # advances (every 8 tiles), at which point all 8 rows are current.
    rsel = jax.lax.broadcasted_iota(jnp.int32, words8_scr.shape, 0) == jax.lax.rem(
        i, 8
    )
    words8_scr[...] = jnp.where(rsel, word[None, :], words8_scr[...])
    words_ref[...] = words8_scr[...]
    # two CRCs at once: P slab columns 0..31 = header table rows (zero
    # outside bits [0, 48)), 32..63 = payload table rows (zero outside the
    # payload byte span)
    crc_ref[...] = crc_ref[...] + jax.lax.dot_general(
        p_ref[...], bits_scr[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [64, Bt]
    qual_ref[0, :] = qual_ref[0, :] + conf_acc
    qual_ref[1, :] = qual_ref[1, :] + best_acc
    qual_ref[2, :] = qual_ref[2, :] + total_acc


@functools.lru_cache(maxsize=32)
def _frame_crc_tables(payload_len: int, n_tiles: int, nb: int):
    """Host-side P slab array + xor consts for the fused frame parse.

    Returns (P [n_tiles * nb, 64] f32, hdr_const, pay_const): columns
    0..31 hold the header checksum's bit-contribution rows (crc32 over
    section bytes 0..5 — frame._parse_header), columns 32..63 the payload
    checksum's (crc32 over bytes 8..8+payload_len); rows outside each
    range are zero, so padded tiles contribute nothing.

    Row order is the kernel's BIT-MAJOR tile layout: within tile i, row
    k * sb + s corresponds to message bit (i*sb + s) * bps + k (bit k of
    symbol s) — the kernel stores bits as bps [sb, Bt] blocks instead of
    sb*bps sublane-1 rows.
    """
    import numpy as np

    from anet.dsp.fec import _crc32_bit_table
    from anet.dsp.frame import HEADER_BYTES

    p = np.zeros((n_tiles * nb, 64), np.float32)
    p_hdr, c_hdr = _crc32_bit_table(6)
    p[: 6 * 8, :32] = p_hdr
    p_pay, c_pay = _crc32_bit_table(payload_len)
    lo = HEADER_BYTES * 8
    p[lo : lo + payload_len * 8, 32:] = p_pay
    # permute rows from bit order to the kernel's per-tile (k, s) layout
    sb = TM_SYMBOL_TILE
    bps = nb // sb
    idx = np.arange(n_tiles * nb)
    tile, within = idx // nb, idx % nb
    k, s = within // sb, within % sb
    src = tile * nb + s * bps + k  # message-bit row feeding kernel row idx
    p = p[src]
    return p, int(c_hdr), int(c_pay)


@functools.partial(
    jax.jit,
    static_argnums=(0, 2),
    static_argnames=("compute_dtype", "interpret", "preamble_offset"),
)
def decide_frame_tm(
    config: ModemConfig,
    data_tm: jnp.ndarray,
    payload_len: int,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    preamble_offset: int = 0,
):
    """Time-major fused symbol decision WITH the frame parse folded into
    the kernel tail — the headline receiver's full-fusion form.

    The decisions form (decide_tones_tm) leaves a measured ~2 ms/iter XLA
    epilogue at B=16384: three [S, B] outputs re-read and transposed, the
    bit unpack / byte pack matmuls, and the CRC contraction
    (docs/PERF.md round-3 roofline). Here the kernel emits
    - packed decision words int32 [n_tiles, B] (sb symbols/word — 1/24th
      the output bytes),
    - both checksums as f32 bit-count accumulators [64, B] (parity mod 2
      taken outside — counts < 2^24 so f32 sums are exact),
    - quality sums f32 [8, B] (conf/best/total in rows 0..2),
    so the XLA tail is byte extraction + compares on KB-scale tensors
    (frame.frame_result_from_packed).

    Requires bits_per_symbol in {1, 2, 4} (whole bytes per 8-symbol
    tile); num_tones <= 16 keeps the I/Q block in one 32-sublane tile.

    Returns (words int32 [n_tiles, B], crc_counts f32 [64, B],
    qual f32 [8, B], n_symbols). The xor consts live in
    _frame_crc_tables (the parser re-derives them — they cannot ride a
    jitted return without being traced into int32, which overflows).

    ``preamble_offset``: static row offset of the data section within
    ``data_tm`` — pass the preamble length to feed WHOLE frames [T, B]
    with ZERO copies: the offset folds into the input BlockSpec's index
    map, so the kernel simply never reads the preamble rows. Slicing the
    data section in-jit instead materializes a full copy of it to feed
    the Pallas operand — measured 6.27 vs 2.79 ms at B=16384 (the
    round-5 headline bisection, tools/exp_ceiling5.py: the hidden ~3.5 ms
    'slice tax' every prior headline measurement paid). Falls back to an
    explicit slice when the offset/geometry padding makes the zero-copy
    form impossible (offset not a multiple of the block height, or
    pad rows/lanes needed anyway).
    """
    from anet.dsp.frame import data_symbols_for_payload

    sps = config.samples_per_symbol
    m = config.num_tones
    bps = config.bits_per_symbol
    if bps not in (1, 2, 4):
        raise ValueError("decide_frame_tm needs bits_per_symbol in {1, 2, 4}")
    sb = TM_SYMBOL_TILE
    nb = sb * bps
    t, b = data_tm.shape
    s = data_symbols_for_payload(config, payload_len)
    if t - preamble_offset < s * sps:
        raise ValueError(
            f"data_tm too short: {t} - {preamble_offset} < {s} symbols x {sps}"
        )
    s_pad = -s % sb
    bt = TM_LANE_TILE if b >= TM_LANE_TILE else -(-b // 128) * 128
    b_pad = -b % bt
    off_blocks = 0
    if preamble_offset and (
        s_pad
        or b_pad
        or preamble_offset % (sb * sps)
        or t != preamble_offset + s * sps
    ):
        # zero-copy form impossible: slice (materializes a copy)
        data_tm = data_tm[preamble_offset:]
        preamble_offset = 0
        t = data_tm.shape[0]
    if preamble_offset:
        off_blocks = preamble_offset // (sb * sps)
        w = data_tm.astype(compute_dtype)  # no-op cast on the hot path
    else:
        w = data_tm[: s * sps].astype(compute_dtype)
        if s_pad or b_pad:
            w = jnp.pad(w, ((0, s_pad * sps), (0, b_pad)))
    sp, bp = s + s_pad, b + b_pad
    n_tiles = sp // sb
    if jnp.dtype(compute_dtype) == jnp.int8:
        # quantized-ingest variant: int8 basis at x127 scale (phases still
        # f32 — see demod_basis), int8 x int8 -> int32 contraction in the
        # kernel. Callers quantize the capture ONCE at the edge
        # (round(x * 127 / max|x|)); energies scale uniformly so the
        # decisions, CRC verdicts, and conf/snr ratios are unchanged.
        basis = jnp.round(
            demod_basis(config, dtype=jnp.float32).T * 127.0
        ).astype(jnp.int8)
    else:
        basis = demod_basis(config, dtype=compute_dtype).T  # [2M, sps]
    p_np, _c_hdr, _c_pay = _frame_crc_tables(payload_len, n_tiles, nb)
    p = jnp.asarray(p_np)

    grid = (bp // bt, n_tiles)
    nt8 = -(-n_tiles // 8) * 8
    words, crc, qual = pl.pallas_call(
        functools.partial(
            _decide_frame_tm_kernel,
            num_tones=m, sps=sps, sb=sb, bps=bps, n_tiles=n_tiles,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt8, bp), jnp.int32),
            jax.ShapeDtypeStruct((64, bp), jnp.float32),
            jax.ShapeDtypeStruct((8, bp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * m, sps), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 64), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (sb * sps, bt),
                lambda j, i, ob=off_blocks: (i + ob, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((8, bt), lambda j, i: (i // 8, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, bt), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bt), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, bt), jnp.float32),
            pltpu.VMEM((8, bt), jnp.int32),
            pltpu.VMEM((sb, bt), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * sp * sps * 2 * m * bp,
            bytes_accessed=sp * sps * bp * w.dtype.itemsize + n_tiles * bp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(basis, p, w)
    return words[:n_tiles, :b], crc[:, :b], qual[:, :b], s


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
# Trellis steps per grid iteration. MUST be a multiple of 24: of 6
# because the forward kernel's rotating state relabeling cycles with
# period 6 (= state bits) and the per-step phase is static only when
# r_steps % 6 == 0 makes the absolute step index congruent to the
# unrolled loop index mod 6; and of 8 because the traceback kernel's
# [r_steps, bt] output block needs sublane divisibility.
VIT_STEP_TILE = 24
_VIT_STATES = 64  # 2**(K-1), K=7
_VIT_BIG = 1e9  # python scalar: a captured jnp constant would break kernel tracing


def _rotl6(x, k):
    """Rotate 6-bit state labels left by k (numpy int array in, array out)."""
    return ((x << k) | (x >> (6 - k))) & 63 if k else x


def _vit_fwd_kernel(sign6_ref, pack6_ref, rx_ref, take_ref, pm_ref, *, r_steps, t_total):
    """Forward ACS with ROTATING state labels — no permutation matmul.

    The trellis transition is new = ((old << 1) | j) & 63: every step
    shifts the 6-bit state register left. Instead of moving the path
    metrics to follow (round 2 did it as a 3-pass one-hot MXU matmul —
    ~1.7 TFLOP over a 2100-step trellis at B=16384, the measured bulk of
    the 30-vs-17 ms roofline gap flagged by the round-2 review), keep
    them IN PLACE and rotate the labels: store q_t[x] = pm_t[rotl6(x, t)].
    Then step t touches only bit p = (5 - t) % 6 of the label — the two
    predecessors of every destination are the pair {x, x ^ (1 << p)} —
    so the data movement collapses to one static sublane roll per
    candidate leg, and the branch-metric/pack tables are the same tables
    pre-permuted per phase (6 static copies, built host-side). The phase
    is static in the unrolled loop because r_steps % 6 == 0.
    """
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        # pm_0 = 0 for state 0, BIG elsewhere — invariant under any
        # relabeling (rotl6(0, k) == 0 and the rest are uniform).
        rows = jax.lax.broadcasted_iota(jnp.int32, pm_ref.shape, 0)
        pm_ref[...] = jnp.where(rows == 0, 0.0, _VIT_BIG).astype(jnp.float32)

    s6 = sign6_ref[...]  # [6, 64, 4] per-phase destination sign tables
    p6 = pack6_ref[...]  # [6, 4, 64] per-phase bit-pack weight tables
    rows = jax.lax.broadcasted_iota(jnp.int32, pm_ref.shape, 0)
    for r in range(r_steps):

        @pl.when(tb * r_steps + r < t_total)
        def _step(r=r):
            p = (5 - r) % 6  # label bit replaced this step
            phi = (r + 1) % 6  # destination labeling phase
            shift = 1 << p
            rx0 = rx_ref[r, 0:1, :]  # [1, bt]
            rx1 = rx_ref[r, 1:2, :]
            sp = s6[phi]  # [64, 4] signs[rotl6(x, phi)]
            q = pm_ref[...]
            bitp = (rows & shift) != 0
            # e_b[x] = q[x with bit p := b]: a static sublane roll plus a
            # select — roll(q, +s)[x] = q[x - s] clears a set bit p,
            # roll(q, -s)[x] = q[x + s] sets a clear one. Exact copies
            # (the round-2 one-hot matmul needed a bf16x3 split for the
            # same exactness at 3 MXU passes per step).
            e0 = jnp.where(bitp, jnp.roll(q, shift, axis=0), q)
            e1 = jnp.where(bitp, q, jnp.roll(q, -shift, axis=0))
            cand0 = e0 + sp[:, 0:1] * rx0 + sp[:, 1:2] * rx1
            cand1 = e1 + sp[:, 2:3] * rx0 + sp[:, 3:4] * rx1
            takef = (cand1 < cand0).astype(jnp.float32)  # ties -> j=0
            # No per-step normalization: constants never change an argmin
            # and f32 holds the unnormalized metrics (see fec._viterbi).
            pm_ref[...] = jnp.minimum(cand0, cand1)
            # Pack the 64 decision bits into two int32 lane words on the
            # MXU: the phase table carries weight 2^(ns & 15) at column x
            # (ns = rotl6(x, phi)), so bits land at their ORIGINAL state
            # positions and the traceback kernel needs no phase logic.
            # Exact even single-pass: 0/1 times a power of two, f32
            # accumulation of distinct powers never carries.
            grp = jax.lax.dot_general(
                p6[phi],
                takef,
                (((1,), (0,)), ((), ())),
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
    # Per-phase tables for the rotating-label forward kernel: with
    # q_t[x] = pm_t[rotl6(x, t)], step t's destination x is original
    # state ns = rotl6(x, (t+1) % 6) — so phase phi's sign rows and pack
    # weights are the base tables re-indexed through the rotation.
    import numpy as np

    x = np.arange(_VIT_STATES)
    rot_idx = np.stack([_rotl6(x, phi) for phi in range(6)])  # [6, 64]
    # signs is traced under jit: permute it with a (constant-index) jnp
    # gather; pack6 is signs-independent and stays a folded constant.
    sign6 = signs[jnp.asarray(rot_idx)]  # [6, 64, 4]
    pack6 = np.zeros((6, 4, _VIT_STATES), np.float32)
    for phi in range(6):
        ns_of_x = rot_idx[phi]
        # exact powers of two via integer shift — jnp.exp2 is a ulp off
        # at 2^13/2^15, and the int32 truncation after the pack matmul
        # would turn that ulp into a borrowed low bit
        pack6[phi, ns_of_x >> 4, x] = (1 << (ns_of_x & 15)).astype(np.float32)
    packed = pl.pallas_call(
        functools.partial(_vit_fwd_kernel, r_steps=rs, t_total=t_steps),
        out_shape=jax.ShapeDtypeStruct((tp, 2, np_), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (6, _VIT_STATES, 4), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (6, 4, _VIT_STATES), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((rs, 2, bt), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rs, 2, bt), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((_VIT_STATES, bt), jnp.float32)],
        interpret=interpret,
    )(sign6, jnp.asarray(pack6), rx_tm)
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

COR_LAG_TILE = 512  # lags per output tile (matches sync.py's block sweep winner)
COR_BATCH_TILE = 128  # streams per grid cell
COR_CELL_TILES = 8  # lag tiles computed per grid cell from ONE input load


def _corr_kernel(a_ref, b_ref, tmat_ref, out_ref, *, g: int, n_shift: int):
    """Block-Toeplitz correlation supercell: G consecutive lag tiles from
    a single load of the shared input span.

    Round-2's version expressed the window overlap as n_shift aliased
    BlockSpecs per lag tile, which re-fetched every input block ~n_shift
    (=5) times and serialized five half-tile matmuls per cell — measured
    23.7 ms/step at the stream bench size, ~3x its own MXU bound. An
    intermediate version assembled the cell's span in VMEM scratch before
    one fat dot per tile; the 2 MB/cell VMEM copy measured ~10 ms/step on
    its own (docs/PERF.md round-3 table). This version reads the two
    adjacent input blocks IN PLACE: each lag tile contracts a static
    slice of block A plus (when its span crosses the block boundary) a
    static slice of block B against the matching template band rows —
    full-depth MACs, no copies, no re-reads.
    """
    blk = COR_LAG_TILE
    ga = g * blk
    for j in range(g):
        lo = j * blk
        hi = lo + n_shift * blk
        cut = min(hi, ga)
        acc = jax.lax.dot_general(
            a_ref[:, lo:cut],
            tmat_ref[: cut - lo, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if hi > ga:
            acc = acc + jax.lax.dot_general(
                b_ref[:, : hi - ga],
                tmat_ref[cut - lo :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, lo : lo + blk] = acc


@functools.partial(
    jax.jit, static_argnames=("out_len", "batch_tile", "cell_tiles", "interpret")
)
def correlate_fused(
    seg: jnp.ndarray,
    template: jnp.ndarray,
    out_len: int,
    *,
    batch_tile: int | None = None,
    cell_tiles: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Valid-mode correlation [..., N] x [K] -> [..., out_len] (f32),
    out_len <= N - K + 1, computed supercell-by-supercell in VMEM
    (see _corr_kernel).

    Inputs are taken in their given dtype (bf16 on the chip's hot path);
    accumulation is always f32.
    """
    k = template.shape[-1]
    blk = COR_LAG_TILE
    batch_shape = seg.shape[:-1]
    x = seg.reshape(-1, seg.shape[-1])
    n_streams = x.shape[0]
    n_blocks = -(-out_len // blk)
    n_shift = -(-(k + blk - 1) // blk)  # 512-blocks per band row
    g = cell_tiles or COR_CELL_TILES
    g = max(min(g, n_blocks), n_shift - 1, 1)
    bts = batch_tile or COR_BATCH_TILE
    # Keep the cell's VMEM footprint (a + b + scratch + tmat + out, with
    # in/out double-buffered by the pipeline) under ~10 MB of the 16.
    esize = x.dtype.itemsize
    while bts > 128:
        cell = (
            2 * 2 * g * blk * bts * esize  # a + b, double-buffered
            + n_shift * blk * blk * esize  # tmat
            + 2 * g * blk * bts * 4  # out f32, double-buffered
        )
        if cell <= 10 * 2**20:
            break
        bts //= 2
    n_super = -(-n_blocks // g)
    cols = (n_super + 1) * g * blk
    pad_t = cols - x.shape[-1]
    if pad_t > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_t)))
    else:
        x = x[:, :cols]
    pad_b = -n_streams % bts
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))

    from anet.dsp.sync import banded_template

    tmat = banded_template(template, n_shift * blk, blk)

    grid = (x.shape[0] // bts, n_super)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, g=g, n_shift=n_shift),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n_super * g * blk), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bts, g * blk), lambda i, t: (i, t)),
            pl.BlockSpec((bts, g * blk), lambda i, t: (i, t + 1)),
            pl.BlockSpec((n_shift * blk, blk), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bts, g * blk), lambda i, t: (i, t)),
        interpret=interpret,
    )(x, x, tmat)
    out = out[:n_streams, :out_len]
    return out.reshape(*batch_shape, out_len)


# --- fused sync search (correlate + quality + argmax) ------------------------

SRCH_BATCH_TILE = 128  # streams per grid cell (VMEM-sized with g=8 below)
SRCH_CELL_TILES = 8  # 512-lag tiles per supercell


def _search_kernel(
    te_ref,
    a_ref,
    b_ref,
    tmat_ref,
    onesb_ref,
    slid_ref,
    q_ref,
    idx_ref,
    rq_ref,
    ridx_ref,
    qt_ref,
    *,
    g: int,
    n_shift: int,
    kb: int,
    out_len: int,
    n_super: int,
):
    """One supercell of the fused preamble search.

    Computes g 512-lag correlation tiles from a single load of the shared
    input span, normalizes them into blockwise match quality IN VMEM, and
    folds the result into a running (best quality, best lag) pair held in
    scratch across the supercell axis — so the [B, out_len] correlation
    and quality arrays never exist in HBM. Only two [B, 1] vectors come
    back, which is all the streaming receiver's candidate nomination uses
    (anet.stream._find_candidate).
    """
    blk = COR_LAG_TILE
    ga = g * blk
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        rq_ref[...] = jnp.full_like(rq_ref, -1.0)
        ridx_ref[...] = jnp.zeros_like(ridx_ref)

    # 1. blockwise window energy (sync.blockwise_match_quality's grid):
    # square the two input blocks IN PLACE (a VMEM span copy here measured
    # ~10 ms/step at the bench size — docs/PERF.md round-3), sum per
    # 128-sample block via static slices of one 0/1 matrix, slide a
    # kb-block superset window (banded 0/1 matmul), floor, rsqrt.
    sa = a_ref[...].astype(jnp.float32)
    bsums_a = jax.lax.dot_general(
        sa * sa, onesb_ref[:ga, : ga // _LANE_BC],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bts, ga/128]
    if n_shift > 1:
        sb = b_ref[:, : (n_shift - 1) * blk].astype(jnp.float32)
        bsums_b = jax.lax.dot_general(
            sb * sb, onesb_ref[ga:, ga // _LANE_BC :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bsums = jnp.concatenate([bsums_a, bsums_b], axis=1)
    else:
        bsums = bsums_a
    win = jax.lax.dot_general(
        bsums, slid_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bts, g*4] — one energy window per 128-lag block
    te = te_ref[0]
    floored = jnp.maximum(win, 1e-4 * te)
    scale = jax.lax.rsqrt(te * floored)  # [bts, g*4]
    # broadcast one value per 128-lag block to lanes via 0/1 matmul
    bcast = (
        jax.lax.broadcasted_iota(jnp.int32, (g * 4, g * 4 * _LANE_BC), 1)
        // _LANE_BC
        == jax.lax.broadcasted_iota(jnp.int32, (g * 4, g * 4 * _LANE_BC), 0)
    ).astype(jnp.float32)
    scale_bc = jax.lax.dot_general(
        scale, bcast, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bts, g*blk]

    # 2. correlation tiles, read in place: each lag tile contracts a
    # static slice of block A plus (when the span crosses the boundary) a
    # static slice of block B against the matching template band rows.
    # The normalized tiles collect in a supercell-wide VMEM buffer and
    # fold into the running (best, arglag) ONCE per supercell: the
    # per-tile max+argmax fold serialized a cross-lane reduction against
    # every band matmul (g reduce pairs per cell); batching it cuts the
    # reduction count g-fold for 2 MB of scratch.
    for j in range(g):
        lo = j * blk
        hi = lo + n_shift * blk
        cut = min(hi, ga)
        acc = jax.lax.dot_general(
            a_ref[:, lo:cut],
            tmat_ref[: cut - lo, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if hi > ga:
            acc = acc + jax.lax.dot_general(
                b_ref[:, : hi - ga],
                tmat_ref[cut - lo :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        qt_ref[:, lo : lo + blk] = jnp.abs(acc) * scale_bc[:, lo : lo + blk]
    q_all = qt_ref[...]  # [bts, g*blk]
    # mask lags beyond out_len (the zero-padded tail of the last cell)
    lane = jax.lax.broadcasted_iota(jnp.int32, q_all.shape, 1)
    q_all = jnp.where(lane + t * ga < out_len, q_all, -2.0)
    # fold into the running best (strict > keeps the earliest maximum,
    # matching jnp.argmax semantics)
    qmax = jnp.max(q_all, axis=1, keepdims=True)  # [bts, 1]
    qarg = jnp.argmax(q_all, axis=1).astype(jnp.int32)[:, None]
    better = qmax > rq_ref[...]
    rq_ref[...] = jnp.where(better, qmax, rq_ref[...])
    ridx_ref[...] = jnp.where(better, t * ga + qarg, ridx_ref[...])

    @pl.when(t == n_super - 1)
    def _emit():
        q_ref[...] = rq_ref[...]
        idx_ref[...] = ridx_ref[...]


_LANE_BC = 128  # lags per quality block (sync.blockwise granularity)


@functools.partial(
    jax.jit,
    static_argnames=("out_len", "batch_tile", "cell_tiles", "interpret"),
)
def sync_search_fused(
    seg: jnp.ndarray,
    template: jnp.ndarray,
    out_len: int,
    template_energy,
    *,
    batch_tile: int | None = None,
    cell_tiles: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused preamble search: best blockwise match quality and its lag.

    Equivalent to (but never materializing)::

        corr = correlate_template(seg, template, method="matmul")[..., :out_len]
        q = blockwise_match_quality(seg, corr, k, template_energy)
        return q.max(-1), q.argmax(-1)

    which at the streaming bench size writes+reads ~3 GB of [B, out_len]
    f32 intermediates per step (measured 23.7 ms correlation + 15.7 ms
    quality + argmax). Here the only HBM traffic is one read of ``seg``
    and two [B, 1] outputs.

    ``out_len`` must be a multiple of 128 (the streaming receiver's chunk
    sizes are lane-aligned). Returns (best_q f32 [...], best_idx i32 [...]).
    """
    k = template.shape[-1]
    blk = COR_LAG_TILE
    if out_len % _LANE_BC:
        raise ValueError(f"out_len {out_len} must be a multiple of {_LANE_BC}")
    batch_shape = seg.shape[:-1]
    x = seg.reshape(-1, seg.shape[-1])
    n_streams = x.shape[0]
    n_blocks = -(-out_len // blk)
    n_shift = -(-(k + blk - 1) // blk)
    g = cell_tiles or SRCH_CELL_TILES
    g = max(min(g, n_blocks), n_shift - 1, 1)
    bts = batch_tile or SRCH_BATCH_TILE
    n_super = -(-n_blocks // g)
    span_cols = (g + n_shift - 1) * blk
    kb = -(-k // _LANE_BC) + 1  # energy blocks per window (superset)
    if kb + g * blk // _LANE_BC - 1 > span_cols // _LANE_BC:
        raise ValueError(
            f"template ({k}) too long for cell span {span_cols}; raise cell_tiles"
        )
    cols = (n_super + 1) * g * blk
    pad_t = cols - x.shape[-1]
    if pad_t > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_t)))
    else:
        x = x[:, :cols]
    pad_b = -n_streams % bts
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))

    from anet.dsp.sync import banded_template

    tmat = banded_template(template, n_shift * blk, blk)
    nb_span = span_cols // _LANE_BC
    # 0/1 block-sum matrix [span_cols, nb_span] and the banded sliding-
    # window matrix [nb_span, g*4]: win[jb] = sum(bsums[jb:jb+kb])
    onesb = (
        jnp.arange(span_cols)[:, None] // _LANE_BC == jnp.arange(nb_span)[None, :]
    ).astype(x.dtype if x.dtype == jnp.float32 else jnp.float32)
    jb = jnp.arange(nb_span)[:, None]
    jo = jnp.arange(g * (blk // _LANE_BC))[None, :]
    slid = ((jb >= jo) & (jb < jo + kb)).astype(jnp.float32)
    te = jnp.asarray(template_energy, jnp.float32).reshape(1)

    grid = (x.shape[0] // bts, n_super)
    q, idx = pl.pallas_call(
        functools.partial(
            _search_kernel,
            g=g,
            n_shift=n_shift,
            kb=kb,
            out_len=out_len,
            n_super=n_super,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bts, g * blk), lambda i, t: (i, t)),
            pl.BlockSpec((bts, g * blk), lambda i, t: (i, t + 1)),
            pl.BlockSpec((n_shift * blk, blk), lambda i, t: (0, 0)),
            pl.BlockSpec((span_cols, nb_span), lambda i, t: (0, 0)),
            pl.BlockSpec((nb_span, g * (blk // _LANE_BC)), lambda i, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bts, 1), lambda i, t: (i, 0)),
            pl.BlockSpec((bts, 1), lambda i, t: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bts, 1), jnp.float32),
            pltpu.VMEM((bts, 1), jnp.int32),
            pltpu.VMEM((bts, g * COR_LAG_TILE), jnp.float32),
        ],
        interpret=interpret,
    )(te, x, x, tmat, onesb, slid)
    q = q[:n_streams, 0].reshape(batch_shape)
    idx = idx[:n_streams, 0].reshape(batch_shape)
    return q, idx


def _search_blockmax_kernel(
    te_ref,
    a_ref,
    b_ref,
    tmat_ref,
    onesb_ref,
    slid_ref,
    bm_ref,
    *,
    g: int,
    n_shift: int,
    kb: int,
    out_len: int,
    n_super: int,
):
    """One supercell of the BLOCK-MAXIMA preamble search: the band
    matmuls and quality normalization of _search_kernel, but the
    epilogue emits one value per 128-lag block instead of folding a
    running max/argmax in VMEM — the fused fold serialized cross-lane
    reductions (and a [bts, g*blk] quality materialization + broadcast
    matmul) against every band matmul, the measured 3x gap vs the bare
    correlator sweep (docs/PERF.md roofline). XLA folds the [B, nb]
    block maxima and a 128-lag probe refines the exact lag (the
    blockwise normalization scale is constant within a block, so the
    in-block argmax of |corr| IS the in-block argmax of quality)."""
    blk = COR_LAG_TILE
    ga = g * blk
    t = pl.program_id(1)

    sa = a_ref[...].astype(jnp.float32)
    bsums_a = jax.lax.dot_general(
        sa * sa, onesb_ref[:ga, : ga // _LANE_BC],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_shift > 1:
        sb = b_ref[:, : (n_shift - 1) * blk].astype(jnp.float32)
        bsums_b = jax.lax.dot_general(
            sb * sb, onesb_ref[ga:, ga // _LANE_BC :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bsums = jnp.concatenate([bsums_a, bsums_b], axis=1)
    else:
        bsums = bsums_a
    win = jax.lax.dot_general(
        bsums, slid_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bts, g*4]
    te = te_ref[0]
    floored = jnp.maximum(win, 1e-4 * te)
    scale = jax.lax.rsqrt(te * floored)  # [bts, g*4] — one per 128-lag block

    nbpb = blk // _LANE_BC  # 128-blocks per lag tile (4)
    bts = a_ref.shape[0]
    mx = jnp.zeros((bts, g * nbpb), jnp.float32)
    lane = None
    for j in range(g):
        lo = j * blk
        hi = lo + n_shift * blk
        cut = min(hi, ga)
        acc = jax.lax.dot_general(
            a_ref[:, lo:cut],
            tmat_ref[: cut - lo, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if hi > ga:
            acc = acc + jax.lax.dot_general(
                b_ref[:, : hi - ga],
                tmat_ref[cut - lo :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        aabs = jnp.abs(acc)  # [bts, blk]
        for c in range(nbpb):
            col = j * nbpb + c
            cm = jnp.max(aabs[:, c * _LANE_BC : (c + 1) * _LANE_BC], axis=1)
            csel = (
                jax.lax.broadcasted_iota(jnp.int32, (bts, g * nbpb), 1) == col
            )
            mx = jnp.where(csel, cm[:, None], mx)
    q = mx * scale  # blockwise-normalized block maxima
    # mask blocks past out_len (zero-padded tail of the last supercell)
    colix = jax.lax.broadcasted_iota(jnp.int32, (bts, g * nbpb), 1)
    q = jnp.where((t * ga // _LANE_BC + colix) < out_len // _LANE_BC, q, -2.0)
    # lane-pad to a legal 128-lane output block via two stores
    bm_ref[:, : g * nbpb] = q
    bm_ref[:, g * nbpb :] = jnp.full(
        (bts, 128 - g * nbpb), -2.0, jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("out_len", "batch_tile", "cell_tiles", "interpret"),
)
def sync_search_blockmax(
    seg: jnp.ndarray,
    template: jnp.ndarray,
    out_len: int,
    template_energy,
    *,
    batch_tile: int | None = None,
    cell_tiles: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-128-lag block maxima of the blockwise match quality:
    float32 [..., out_len // 128]. Equivalent to::

        corr = correlate_template(seg, template)[..., :out_len]
        q = blockwise_match_quality(seg, corr, k, te)
        return q.reshape(..., out_len // 128, 128).max(-1)

    See _search_blockmax_kernel for why this replaces the fused
    max/argmax fold of sync_search_fused on the hot path.
    """
    k = template.shape[-1]
    blk = COR_LAG_TILE
    if out_len % _LANE_BC:
        raise ValueError(f"out_len {out_len} must be a multiple of {_LANE_BC}")
    batch_shape = seg.shape[:-1]
    x = seg.reshape(-1, seg.shape[-1])
    n_streams = x.shape[0]
    n_blocks = -(-out_len // blk)
    n_shift = -(-(k + blk - 1) // blk)
    g = cell_tiles or SRCH_CELL_TILES
    g = max(min(g, n_blocks), n_shift - 1, 1)
    if g * (blk // _LANE_BC) > 128:
        raise ValueError("cell_tiles too large for one 128-lane output block")
    bts = batch_tile or SRCH_BATCH_TILE
    n_super = -(-n_blocks // g)
    span_cols = (g + n_shift - 1) * blk
    kb = -(-k // _LANE_BC) + 1
    if kb + g * blk // _LANE_BC - 1 > span_cols // _LANE_BC:
        raise ValueError(
            f"template ({k}) too long for cell span {span_cols}; raise cell_tiles"
        )
    cols = (n_super + 1) * g * blk
    pad_t = cols - x.shape[-1]
    if pad_t > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_t)))
    else:
        x = x[:, :cols]
    pad_b = -n_streams % bts
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))

    from anet.dsp.sync import banded_template

    tmat = banded_template(template, n_shift * blk, blk)
    nb_span = span_cols // _LANE_BC
    onesb = (
        jnp.arange(span_cols)[:, None] // _LANE_BC == jnp.arange(nb_span)[None, :]
    ).astype(x.dtype if x.dtype == jnp.float32 else jnp.float32)
    jb = jnp.arange(nb_span)[:, None]
    jo = jnp.arange(g * (blk // _LANE_BC))[None, :]
    slid = ((jb >= jo) & (jb < jo + kb)).astype(jnp.float32)
    te = jnp.asarray(template_energy, jnp.float32).reshape(1)

    grid = (x.shape[0] // bts, n_super)
    bm = pl.pallas_call(
        functools.partial(
            _search_blockmax_kernel,
            g=g, n_shift=n_shift, kb=kb, out_len=out_len, n_super=n_super,
        ),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n_super * 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bts, g * blk), lambda i, t: (i, t)),
            pl.BlockSpec((bts, g * blk), lambda i, t: (i, t + 1)),
            pl.BlockSpec((n_shift * blk, blk), lambda i, t: (0, 0)),
            pl.BlockSpec((span_cols, nb_span), lambda i, t: (0, 0)),
            pl.BlockSpec((nb_span, g * (blk // _LANE_BC)), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bts, 128), lambda i, t: (i, t)),
        interpret=interpret,
    )(te, x, x, tmat, onesb, slid)
    nbpb = blk // _LANE_BC
    bm3 = bm[:n_streams].reshape(n_streams, n_super, 128)[:, :, : g * nbpb]
    bm2 = bm3.reshape(n_streams, n_super * g * nbpb)[:, : out_len // _LANE_BC]
    return bm2.reshape(batch_shape + (out_len // _LANE_BC,))


# --- dynamic-offset row gather (timing alignment) ----------------------------

GR_STREAM_TILE = 16  # streams aligned per grid cell
_GR_LANE = 128


def _gather_rows_kernel(starts_ref, x_ref, out_ref, *, bs: int, rr: int, rt: int):
    """Per-stream alignment: slice rt+1 consecutive 128-sample rows at the
    stream's coarse offset (dynamic SUBLANE slice — a VMEM copy, no
    gather instruction), then rotate the fine offset into place with a
    dynamic lane roll and stitch adjacent rows with a lane-iota select.
    Everything happens in VMEM; the only HBM traffic is the buffer read
    and the aligned output write."""
    cell = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, _GR_LANE), 1)
    for s in range(bs):
        st = starts_ref[cell * bs + s]
        hi = jax.lax.div(st, _GR_LANE)
        lo = jax.lax.rem(st, _GR_LANE)
        rows = x_ref[s, pl.ds(hi, rr), :]  # [rr, 128]
        ru = pltpu.roll(rows, (_GR_LANE - lo) % _GR_LANE, axis=1)
        out_ref[s, :, :] = jnp.where(lane < _GR_LANE - lo, ru[:rt], ru[1:rt + 1])


@functools.partial(
    jax.jit, static_argnames=("size", "block_streams", "interpret")
)
def gather_rows_fused(
    buffer: jnp.ndarray,
    start: jnp.ndarray,
    size: int,
    *,
    block_streams: int = GR_STREAM_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[..., i] = buffer[..., start[...] + i] — the streaming
    receiver's timing-alignment gather (sync.aligned_gather's contract),
    fused into one kernel.

    Each stream's rows are aligned entirely in VMEM: a dynamic sublane
    slice picks the coarse (row) offset and a dynamic lane roll + select
    applies the fine offset, so the only HBM traffic is reading the
    buffer once and writing the aligned output. Exact for any dtype
    (pure data movement — no arithmetic on the samples).

    Honest measurement (v5e, B=8192, frame 36352): 30 ms vs the one-hot
    matmul's 26 — the per-stream slice+roll+select loop serializes
    (~3.5 us/stream of op dispatch) and loses to the one-hot's HBM-bound
    but fully-vectorized matmuls, despite moving ~6x less data. Kept for
    small batches and f32-exact callers (aligned_gather mode="roll");
    the streaming hot path uses the fused sync+demod kernels instead.

    Returns buffer.dtype [..., size]; callers guarantee
    start + size <= buffer length.
    """
    batch_shape = buffer.shape[:-1]
    x = buffer.reshape(-1, buffer.shape[-1])
    st = start.reshape(-1).astype(jnp.int32)
    b, length = x.shape
    rt = -(-size // _GR_LANE)
    rr = rt + 1
    r_total = -(-length // _GR_LANE) + 2  # slack so hi + rr stays in range
    pad_cols = r_total * _GR_LANE - length
    if pad_cols:
        x = jnp.pad(x, ((0, 0), (0, pad_cols)))
    bs = min(block_streams, b) if b >= block_streams else b
    pad_b = -b % bs
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        st = jnp.pad(st, (0, pad_b))
    xr = x.reshape(x.shape[0], r_total, _GR_LANE)

    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, bs=bs, rr=rr, rt=rt),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], rt, _GR_LANE), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(x.shape[0] // bs,),
            in_specs=[
                pl.BlockSpec((bs, r_total, _GR_LANE), lambda i, starts: (i, 0, 0))
            ],
            out_specs=pl.BlockSpec((bs, rt, _GR_LANE), lambda i, starts: (i, 0, 0)),
        ),
        interpret=interpret,
    )(st, xr)
    out = out.reshape(x.shape[0], rt * _GR_LANE)[:b, :size]
    return out.reshape(batch_shape + (size,))


# --- fused align + demodulate (timing gather folded into the filterbank) -----

# Streams per grid cell of the fused align+demod kernels. The per-cell
# cost at stream bench shapes is dominated by fixed per-cell overhead
# (DMA issue serialization + the one-hot shift builds), so larger tiles
# amortize it — bounded by VMEM (the double-buffered slab scratch is
# 2*bs*sv*128 elements). Overridable for experiments via ANET_DA_TILE.
DA_STREAM_TILE = int(os.environ.get("ANET_DA_TILE", "8"))


def _demod_at_front(
    st_ref, stv_ref, x_hbm, slab_scr, sem, dtype, *,
    i, bs: int, sv: int, pv: int, pre: int, ncells: int,
):
    """Shared front half of the fused align+demod kernels: per-stream
    span DMA + lane/row alignment. Returns srows [bs, pv, 128] — the
    frame's 128-sample symbol-group rows, aligned to the frame start.

    The buffer stays in HBM; each stream's frame span (sv rows of 128)
    arrives by ONE async copy starting at its own (8-aligned) coarse row
    — the kernel reads only the bytes it demodulates, where the round-3a
    one-hot row-selection matmul streamed the ENTIRE buffer block through
    VMEM per cell. (The 4% energy error that prompted the rebuild turned
    out to be the bf16-phase basis bug — see demod_basis — not this
    kernel; post-fix, this form measures ~2.5e-7 from float64 on chip.)

    The span copies are DOUBLE-BUFFERED across grid cells (slab_scr and
    sem carry a leading [2] slot axis): cell i issues cell i+1's copies
    before waiting on its own, so the per-cell DMA issue+latency (~4 ms
    of the 13 ms stage at B=8192 — the bisection's dma-only floor) hides
    behind cell i's matmuls instead of serializing ahead of them.
    """
    sl = jax.lax.rem(i, 2)
    nsl = jax.lax.rem(i + 1, 2)

    def _issue(cell, slot):
        for s in range(bs):
            hi = (st_ref[cell * bs + s] + pre) // 128
            hi8 = pl.multiple_of((hi // 8) * 8, 8)
            pltpu.make_async_copy(
                x_hbm.at[cell * bs + s, pl.ds(hi8, sv), :],
                slab_scr.at[slot, s],
                sem.at[slot, s],
            ).start()

    @pl.when(i == 0)
    def _first():
        _issue(i, sl)

    @pl.when(i + 1 < ncells)
    def _next():
        _issue(i + 1, nsl)

    # Shift the SLAB, not the basis. The one-hot matrix sh[s, j, c] =
    # (j == c + lo_s) is the same permutation either way, but applying it
    # to the slab costs bs x (sv-1) x 256 x 128 MACs and leaves the big
    # contraction as ONE shared plain matmul against the 128-wide basis —
    # vs the shifted-basis form's bs x 256 x 128 x r2m build PLUS a
    # 256-deep batched contraction (~4x the FLOPs; on chip the two forms
    # measure ~equal — see docs/PERF.md round-3 demod_at bisection — but
    # this one frees the basis columns to be reordered for the energies
    # epilogue below). Same nonzero products in the same order: the
    # permute is exact (bf16 values round-trip the f32 one-hot dot).
    lo = jax.lax.rem(stv_ref[...].astype(jnp.int32) + pre, 128).reshape(bs, 1, 1)
    j_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 128, 128), 1)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 128, 128), 2)
    # two [128, 128] one-hots per stream, not one [256, 128]: row g's
    # samples at lane offset lo_s straddle slab rows g and g+1, and the
    # natural lane-concat of those rows trips Mosaic's offset-mismatch
    # reject (sharp edge #5 — the 1-row slice carries a sublane offset)
    sh_lo = (j_io == c_io + lo).astype(dtype)  # j = c + lo
    sh_hi = (j_io == c_io + lo - 128).astype(dtype)  # j + 128 = c + lo
    pet = _acc_dtype(dtype)  # int8 slabs permute through int32

    for s in range(bs):
        hi = (st_ref[i * bs + s] + pre) // 128
        hi8 = pl.multiple_of((hi // 8) * 8, 8)
        pltpu.make_async_copy(
            x_hbm.at[i * bs + s, pl.ds(hi8, sv), :],
            slab_scr.at[sl, s],
            sem.at[sl, s],
        ).wait()
    slab_all = slab_scr[sl]  # [bs, sv, 128]
    shifted = (
        jax.lax.dot_general(
            slab_all[:, : sv - 1, :],
            sh_lo,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=pet,
        )
        + jax.lax.dot_general(
            slab_all[:, 1:sv, :],
            sh_hi,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=pet,
        )
    ).astype(slab_all.dtype)  # [bs, sv-1, 128]: exact (one-hot permute)
    # group g of the frame is row delta_s + g of the span: resolve the
    # sub-8-row DMA alignment with one batched 8-way static-slice select
    deltav = jax.lax.rem(
        jax.lax.div(stv_ref[...].astype(jnp.int32) + pre, 128), 8
    ).reshape(bs, 1, 1)
    srows = jnp.zeros((bs, pv, 128), slab_all.dtype)
    for r in range(8):
        srows = jnp.where(deltav == r, shifted[:, r : r + pv, :], srows)
    return srows


def _probe_at_kernel(
    st_ref, stv_ref, x_hbm, tband_ref, corr_ref, en_ref, slab_scr, sem, *,
    bs: int, sv: int, pw: int, pw_e: int, ncells: int,
):
    """Frame-lock probe cell: per-stream span DMA (the _demod_at_front
    machinery — proven on this runtime's Mosaic, unlike the batch-dot
    retired batch-dot probe form it replaces) + the n_lags correlation as
    pw row-dots against a static banded template, + the superset window
    energy. Raw |corr| and energy come out; the caller normalizes
    (tiny [B, lanes] elementwise in XLA)."""
    i = pl.program_id(0)
    srows = _demod_at_front(
        st_ref, stv_ref, x_hbm, slab_scr, sem, tband_ref.dtype,
        i=i, bs=bs, sv=sv, pv=pw, pre=0, ncells=ncells,
    )  # [bs, pw, 128] aligned to st0
    acc = jnp.zeros((bs, 128), jnp.float32)
    for r in range(pw):
        acc = acc + jax.lax.dot_general(
            srows[:, r, :],
            tband_ref[r * 128 : (r + 1) * 128, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    corr_ref[...] = acc
    sf = srows[:, :pw_e, :].astype(jnp.float32)
    sq = sf * sf
    en_ref[...] = jnp.sum(jnp.sum(sq, axis=2), axis=1).reshape(bs, 1)


PROBE_STREAM_TILE = 16


@functools.partial(
    jax.jit,
    static_argnames=("n_lags", "start_bound", "batch_tile", "interpret"),
)
def probe_at_fused(
    buffer: jnp.ndarray,
    st0: jnp.ndarray,
    template: jnp.ndarray,
    template_energy,
    n_lags: int = 5,
    *,
    start_bound: int | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Frame-lock verify/refine probe as a span-DMA kernel: normalized
    preamble quality at ``n_lags`` lags from per-stream ``st0``
    (sync.preamble_quality_probe's contract; st0 pre-clipped by the
    caller). Each stream DMAs only its own ~(k/128 + 2) rows — the jnp
    form's two aligned_gather one-hot passes measured 14.7 ms/step at the
    streaming bench geometry (B=8192, chunk 32768), reading the bounded
    buffer head twice for a ~1 KB answer.

    Window-energy semantics: the superset span here is ST0-ALIGNED rows
    [st0, st0 + ceil((k+n_lags-1)/128)*128 + 128) — a strict superset of
    every probed window, so quality only under-reports (same bound class
    as the jnp form's row-aligned span; values differ by <~6% and the
    0.45-vs-~1.0 threshold margin swallows both). The detection gate and
    the +/-2 drift servo behave identically (CPU equality fuzz:
    tests/test_stream_lock.py).

    Callers guarantee st0 + k + n_lags - 1 + 128 <= buffer length; pass
    ``start_bound`` (static max st0) so the span pad stays inside the
    stream carry's existing demod tail pad (no in-call copy).

    Returns q float32 [..., n_lags].
    """
    k = template.shape[-1]
    batch_shape = buffer.shape[:-1]
    x = buffer.reshape(-1, buffer.shape[-1])
    st = st0.reshape(-1).astype(jnp.int32)
    b, length = x.shape
    if length % 128:
        x = jnp.pad(x, ((0, 0), (0, (-length) % 128)))
    rows_total = x.shape[-1] // 128
    pw_e = -(-(k + n_lags - 1) // 128) + 1  # energy/correlation row span
    pw = -(-pw_e // 8) * 8  # sublane-tiled srows row count
    sv = (-(-(pw + 2) // 8)) * 8 + 8
    if start_bound is None:
        start_bound = length - (k + n_lags - 1) - 128
    hi_max = max(int(start_bound), 0) // 128
    pad_rows = max(0, hi_max + sv - rows_total)
    if pad_rows:
        # correctness fallback (full copy); hot callers pre-pad instead
        x = jnp.pad(x, ((0, 0), (0, pad_rows * 128)))
        rows_total += pad_rows
    bs = batch_tile or PROBE_STREAM_TILE
    bs = min(bs, b) if b >= bs else b
    pad_b = -b % bs
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        st = jnp.pad(st, (0, pad_b))
    xr = x.reshape(x.shape[0], rows_total, 128)

    # banded template: tband[j, o] = template[j - o] for o < n_lags
    t_c = template
    jj = jnp.arange(pw * 128)[:, None]
    oo = jnp.arange(128)[None, :]
    tj = jj - oo
    tband = jnp.where(
        (tj >= 0) & (tj < k) & (oo < n_lags),
        t_c[jnp.clip(tj, 0, k - 1)],
        jnp.zeros((), t_c.dtype),
    ).astype(x.dtype)

    ncells = xr.shape[0] // bs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncells,),
        in_specs=[
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((pw * 128, 128), lambda i, st: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bs, 128), lambda i, st: (i, 0)),
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bs, sv, 128), xr.dtype),
            pltpu.SemaphoreType.DMA((2, bs)),
        ],
    )
    corr, en = pl.pallas_call(
        functools.partial(
            _probe_at_kernel, bs=bs, sv=sv, pw=pw, pw_e=pw_e, ncells=ncells
        ),
        out_shape=(
            jax.ShapeDtypeStruct((xr.shape[0], 128), jnp.float32),
            jax.ShapeDtypeStruct((xr.shape[0], 1), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(st, st.reshape(-1, 1), xr, tband)
    te = jnp.asarray(template_energy, jnp.float32)
    floored = jnp.maximum(en[:b], 1e-4 * te)
    q = jnp.abs(corr[:b, :n_lags]) * jax.lax.rsqrt(te * floored)
    return q.reshape(batch_shape + (n_lags,))


def _demod_at_kernel(
    st_ref,
    stv_ref,
    x_hbm,
    bbase_ref,
    tone_ref,
    best_ref,
    total_ref,
    slab_scr,
    sem,
    *,
    bs: int,
    sv: int,
    pv: int,
    pp: int,
    r_syms: int,
    m: int,
    pre: int,
    ncells: int,
):
    """Fused align+demod cell, decisions epilogue (fallback geometries —
    see _demod_at_energies_kernel for the hot form). The residual sub-8
    alignment is an 8-way static-slice select; the fine lane offset is a
    one-hot permute of the slab (see _demod_at_front)."""
    i = pl.program_id(0)
    r2m = 2 * m * r_syms
    srows = _demod_at_front(
        st_ref, stv_ref, x_hbm, slab_scr, sem, bbase_ref.dtype,
        i=i, bs=bs, sv=sv, pv=pv, pre=pre, ncells=ncells,
    )
    # shared contraction: every stream's rows hit the same [128, r2m]
    # basis, so the MXU sees one [bs*pv, 128] x [128, r2m] matmul
    # (int8 slabs take the int8 x int8 -> int32 path; the f32 cast
    # happens BEFORE squaring, as in _decide_frame_tm_kernel's int8 form)
    iq = (
        jax.lax.dot_general(
            srows.reshape(bs * pv, 128),
            bbase_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=_acc_dtype(bbase_ref.dtype),
        )
        .astype(jnp.float32)
        .reshape(bs, pv, r2m)
    )

    # decisions per in-row symbol slot; groups >= pv are zero padding
    for u in range(r_syms):
        iqu = iq[:, :, u * 2 * m : (u + 1) * 2 * m]
        i_part = iqu[:, :, :m]
        q_part = iqu[:, :, m:]
        e = i_part * i_part + q_part * q_part  # [bs, pv, M]
        tone_ref[:, u * pp : u * pp + pv] = jnp.argmax(e, axis=-1).astype(
            jnp.int32
        )
        best_ref[:, u * pp : u * pp + pv] = jnp.max(e, axis=-1)
        total_ref[:, u * pp : u * pp + pv] = jnp.sum(e, axis=-1)
        if pp > pv:
            tone_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                (bs, pp - pv), jnp.int32
            )
            best_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                (bs, pp - pv), jnp.float32
            )
            total_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                (bs, pp - pv), jnp.float32
            )


def _demod_at_energies_kernel(
    st_ref,
    stv_ref,
    x_hbm,
    bbase_ref,
    e_ref,
    slab_scr,
    sem,
    *,
    bs: int,
    sv: int,
    pv: int,
    r_syms: int,
    m: int,
    pre: int,
    ncells: int,
):
    """Fused align+demod cell, ENERGIES epilogue (demod_at_energies_fused).

    Writes raw per-(group, slot, tone) energies e [bs, pv, m*r_syms]
    with lane order (u-major, tone-minor); bbase's columns are reordered
    I-block-then-Q-block so the square-add is ONE [bs, pv, mr] op on two
    clean 128-aligned lane halves — no decisions loop in the kernel, and
    the flat (group, slot) output order IS symbol order."""
    i = pl.program_id(0)
    mr = m * r_syms
    srows = _demod_at_front(
        st_ref, stv_ref, x_hbm, slab_scr, sem, bbase_ref.dtype,
        i=i, bs=bs, sv=sv, pv=pv, pre=pre, ncells=ncells,
    )
    iq = (
        jax.lax.dot_general(
            srows.reshape(bs * pv, 128),
            bbase_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=_acc_dtype(bbase_ref.dtype),
        )
        .astype(jnp.float32)
        .reshape(bs, pv, 2 * mr)
    )
    i_part = iq[:, :, :mr]
    q_part = iq[:, :, mr:]
    e_ref[...] = i_part * i_part + q_part * q_part


def _demod_at_setup(config, buffer, start, n_symbols, start_bound, batch_tile):
    """Shared geometry/padding/basis setup of the fused align+demod
    wrappers. Returns (batch_shape, xr, st, b, bs, sv, pv, pp, r_syms,
    m, pre, blocks) — xr is the (possibly padded) [Bp, rows_total, 128]
    row view, blocks the per-slot [128, 2m] basis blocks (f32 unless the
    buffer itself is low-precision). The pad arithmetic MUST stay in
    sync with demod_at_buffer_pad."""
    sps = config.samples_per_symbol
    m = config.num_tones
    if 128 % sps:
        raise ValueError(f"demod_at_fused needs 128 %% sps == 0, got sps={sps}")
    r_syms = 128 // sps
    pre = config.preamble_symbols * sps
    batch_shape = buffer.shape[:-1]
    x = buffer.reshape(-1, buffer.shape[-1])
    st = start.reshape(-1).astype(jnp.int32)
    b, length = x.shape
    if length % 128:
        x = jnp.pad(x, ((0, 0), (0, (-length) % 128)))
    rows_total = x.shape[-1] // 128
    # symbol groups: r_syms consecutive symbols per 128-sample row
    p = -(-n_symbols // r_syms)
    # output lanes r_syms*pp must tile by 128; slab/iq sublanes by 8
    gran = 128 // math.gcd(128, r_syms)
    pp = -(-p // gran) * gran
    pv = -(-p // 8) * 8
    # span rows per DMA: pv+1 wanted rows, +1 sublane-rounding, +8 because
    # the DMA starts at the 8-aligned row at-or-before the coarse row
    sv = (-(-(pv + 2) // 8)) * 8 + 8
    if start_bound is None:
        start_bound = length - pre - n_symbols * sps  # worst legal start
    hi_max = (start_bound + pre) // 128
    pad_rows = max(0, hi_max + sv - rows_total)
    if pad_rows:
        # correctness fallback (full copy); hot callers pre-pad instead
        x = jnp.pad(x, ((0, 0), (0, pad_rows * 128)))
        rows_total += pad_rows
    bs = batch_tile or DA_STREAM_TILE
    bs = min(bs, b) if b >= bs else b
    pad_b = -b % bs
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        st = jnp.pad(st, (0, pad_b))
    xr = x.reshape(x.shape[0], rows_total, 128)

    if x.dtype == jnp.int8:
        # int8 stream-buffer variant: int8 basis at x127 scale (phases
        # stay f32 — see demod_basis; a plain astype would truncate the
        # ±1-scale table to zero). Energies scale uniformly by
        # (127 * buffer_scale)^2 — decisions and conf/snr RATIOS are
        # invariant, same contract as decide_frame_tm's quantized ingest.
        basis = jnp.round(
            demod_basis(config, dtype=jnp.float32) * 127.0
        ).astype(jnp.int8)
    else:
        basis = demod_basis(
            config, dtype=x.dtype if x.dtype != jnp.float32 else jnp.float32
        )
    j0 = jnp.arange(128)
    blocks = []
    for u in range(r_syms):
        idx = j0 - u * sps
        ok = (idx >= 0) & (idx < sps)
        blocks.append(
            jnp.where(
                ok[:, None],
                basis[jnp.clip(idx, 0, sps - 1)],
                jnp.zeros((), basis.dtype),
            )
        )
    return batch_shape, xr, st, b, bs, sv, pv, pp, r_syms, m, pre, blocks


@functools.partial(
    jax.jit,
    static_argnums=(0, 3),
    static_argnames=("start_bound", "batch_tile", "interpret"),
)
def demod_at_energies_fused(
    config: ModemConfig,
    buffer: jnp.ndarray,
    start: jnp.ndarray,
    n_symbols: int,
    *,
    start_bound: int | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Fused timing-align + FULL tone-energy filterbank straight from the
    stream buffer: f32 [..., n_symbols, num_tones] — the energies twin of
    demod_at_fused, for consumers that need every tone's energy (soft FEC
    LLRs — anet.dsp.demod.bit_llrs — need the whole row, not just the
    winner). Equivalent to (but never materializing)::

        aligned = aligned_gather(buffer, start, t_frame)
        return tone_energies(config, aligned[..., preamble:])

    Same DMA-span front as demod_at_fused; the epilogue writes raw
    energies with a basis whose columns are I-block-then-Q-block so the
    square-add is one op on two 128-aligned lane halves. Kernel-only this
    is FASTER than the decisions form (11.1 vs 13.4 ms at B=8192 on a
    v5e) — the decisions kernel stays the uncoded-stream default only
    because its reduced outputs fuse into the frame parse (see
    demod_at_fused's body comment).

    Same geometry rules as demod_at_fused (128 % sps == 0). The I/Q half
    split is cheapest when num_tones * r_syms is a multiple of 128 (the
    flagship's 16*16=256); narrower geometries still compile — the halves
    are static lane slices, same as the decisions kernel's per-slot ones."""
    (batch_shape, xr, st, b, bs, sv, pv, pp, r_syms, m, pre, blocks) = (
        _demod_at_setup(config, buffer, start, n_symbols, start_bound, batch_tile)
    )
    mr = m * r_syms
    bbase = jnp.concatenate(
        [blk[:, :m] for blk in blocks] + [blk[:, m:] for blk in blocks],
        axis=1,
    ).astype(xr.dtype)  # [128, 2*mr], I-blocks then Q-blocks (u-major)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(xr.shape[0] // bs,),
        in_specs=[
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((128, 2 * mr), lambda i, st: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, pv, mr), lambda i, st: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bs, sv, 128), xr.dtype),  # double-buffered spans
            pltpu.SemaphoreType.DMA((2, bs)),
        ],
    )
    e = pl.pallas_call(
        functools.partial(
            _demod_at_energies_kernel,
            bs=bs, sv=sv, pv=pv, r_syms=r_syms, m=m, pre=pre,
            ncells=xr.shape[0] // bs,
        ),
        out_shape=jax.ShapeDtypeStruct((xr.shape[0], pv, mr), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(st, st.reshape(-1, 1), xr, bbase)
    # flat (group, slot) IS symbol order; merging the two major dims is
    # layout-free (minor tone axis untouched)
    e3 = e[:b].reshape(b, pv * r_syms, m)[:, :n_symbols, :]
    return e3.reshape(batch_shape + (n_symbols, m))


@functools.partial(
    jax.jit,
    static_argnums=(0, 3),
    static_argnames=("start_bound", "batch_tile", "interpret"),
)
def demod_at_fused(
    config: ModemConfig,
    buffer: jnp.ndarray,
    start: jnp.ndarray,
    n_symbols: int,
    *,
    start_bound: int | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Fused timing-align + MFSK symbol decision straight from the stream
    buffer: (tone, best, total) int32/f32 [..., n_symbols] for the frame
    whose PREAMBLE starts at ``start[...]`` (data section begins
    ``preamble_symbols * sps`` later; callers guarantee the whole frame
    fits: start + frame samples <= buffer length).

    Equivalent to (but never materializing)::

        aligned = aligned_gather(buffer, start, t_frame)
        e = tone_energies(config, aligned[..., preamble:])
        return argmax(e), max(e), sum(e)

    The buffer stays in HBM and each stream DMAs only its own frame span
    into VMEM (see _demod_at_kernel) — the kernel reads ~the frame bytes,
    not the whole buffer, and its arithmetic measures ~2.5e-7 from
    float64 on chip. f32 buffers keep full f32 sample precision on the
    DMA path (pure data movement).

    ``start_bound`` (static) is the maximum ``start`` the caller can
    produce. The span DMA must stay inside the array even for the latest
    start, which needs the buffer padded by ``demod_at_buffer_pad``; when
    the buffer is too short the function zero-pads it (a full HBM copy —
    the streaming receiver instead carries a tail-padded buffer so this
    is free on the hot path). Default start_bound assumes the worst
    legal start for this buffer length.

    Requires 128 %% samples_per_symbol == 0 (sps <= 128, power-of-two
    fraction); other geometries use the unfused path.
    """
    (batch_shape, xr, st, b, bs, sv, pv, pp, r_syms, m, pre, blocks) = (
        _demod_at_setup(config, buffer, start, n_symbols, start_bound, batch_tile)
    )
    x = xr  # [Bp, rows_total, 128]
    r2m = 2 * m * r_syms

    # Decisions-in-kernel is the STREAM winner, measured, despite the
    # energies twin (demod_at_energies_fused) being 2.3 ms faster
    # kernel-only (11.1 vs 13.4 at B=8192): the energies form needs a
    # real 3.3 ms argmax/max/sum pass over its [B, pv, r_syms, m] output,
    # while this form's [B, r_syms, pp] unpack transpose fuses into the
    # downstream frame parse (bit unpack / byte pack) under jit — the
    # full stream measured 7425 (decisions) vs 7245 (energies) Msamp/s.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(x.shape[0] // bs,),
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
            pltpu.VMEM((2, bs, sv, 128), x.dtype),  # double-buffered spans
            pltpu.SemaphoreType.DMA((2, bs)),
        ],
    )
    bbase = jnp.concatenate(blocks, axis=1).astype(x.dtype)  # [128, R*2M]
    tone, best, total = pl.pallas_call(
        functools.partial(
            _demod_at_kernel,
            bs=bs,
            sv=sv,
            pv=pv,
            pp=pp,
            r_syms=r_syms,
            m=m,
            pre=pre,
            ncells=x.shape[0] // bs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], r_syms * pp), jnp.int32),
            jax.ShapeDtypeStruct((x.shape[0], r_syms * pp), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], r_syms * pp), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(st, st.reshape(-1, 1), xr, bbase)

    def _unpack(o):
        o3 = o[:b].reshape(b, r_syms, pp)
        o3 = jnp.moveaxis(o3, 1, 2).reshape(b, pp * r_syms)[:, :n_symbols]
        return o3.reshape(batch_shape + (n_symbols,))

    return _unpack(tone), _unpack(best), _unpack(total)


def _demod_probe_kernel(
    st_ref,
    stv_ref,
    x_hbm,
    tband_ref,
    bbase_ref,
    cmax_ref,
    off_ref,
    en_ref,
    tone_ref,
    best_ref,
    total_ref,
    slab_scr,
    sem,
    pw_scr,
    *,
    bs: int,
    sv: int,
    pv: int,
    pp: int,
    pw_e: int,
    r_syms: int,
    m: int,
    pre_rows: int,
    n_lags: int,
    ncells: int,
):
    """MERGED frame-lock probe + align+demod cell — the locked stream's
    whole per-chunk signal work in one kernel, one span DMA, one slab
    shift. The separate probe and demod kernels each paid their own
    per-stream DMA issue and lane-alignment one-hot passes (~13 ms each
    at the bench geometry — the round-4 lock bisection); here the span
    starts at the PROBE base (st0 // 128, one preamble ahead of the
    demod-only kernel's base) so the probe reads the slab's prefix rows
    IN PLACE:

    - probe: 8-way row select (no lane shift needed — the correlation is
      computed at all 128 lags of the base row via the shared banded
      template, then the per-stream 5-lag window is one one-hot lane
      extract), superset window energy, off = in-block argmax of |corr|
      (the normalization scale is one value per stream, so this IS the
      argmax of quality);
    - demod: the usual shift-the-slab one-hot pair, built from the
      REFINED offset st0 + off + pre, then the (pre_rows+9)-way row
      select and the shared basis contraction + decisions epilogue.

    Emits raw corr [bs, n_lags] and window energy [bs, 1] (the caller
    normalizes — tiny XLA elementwise) plus the demod triple at
    st0 + off.
    """
    i = pl.program_id(0)
    sl = jax.lax.rem(i, 2)
    nsl = jax.lax.rem(i + 1, 2)
    dtype = bbase_ref.dtype
    r2m = 2 * m * r_syms

    def _issue(cell, slot):
        for s in range(bs):
            hi = st_ref[cell * bs + s] // 128
            hi8 = pl.multiple_of((hi // 8) * 8, 8)
            pltpu.make_async_copy(
                x_hbm.at[cell * bs + s, pl.ds(hi8, sv), :],
                slab_scr.at[slot, s],
                sem.at[slot, s],
            ).start()

    @pl.when(i == 0)
    def _first():
        _issue(i, sl)

    @pl.when(i + 1 < ncells)
    def _next():
        _issue(i + 1, nsl)

    for s in range(bs):
        hi = st_ref[i * bs + s] // 128
        hi8 = pl.multiple_of((hi // 8) * 8, 8)
        pltpu.make_async_copy(
            x_hbm.at[i * bs + s, pl.ds(hi8, sv), :],
            slab_scr.at[sl, s],
            sem.at[sl, s],
        ).wait()
    slab = slab_scr[sl]  # [bs, sv, 128]

    stv = stv_ref[...].astype(jnp.int32)  # [bs, 1]
    lo0 = jax.lax.rem(stv, 128)  # [bs, 1]
    delta0 = jax.lax.rem(jax.lax.div(stv, 128), 8).reshape(bs, 1, 1)

    # --- probe: row-aligned 128-lag correlation, ONE wide matmul ---
    # select the probe rows, then lay them out [bs, pw_e*128] in scratch
    # (each store is a clean 128-lane tile) so all pw_e band rows
    # contract in a single dot — a per-row dot loop here cost ~10 small
    # matmuls per cell, most of the merged kernel's first-cut overhead
    prows = jnp.zeros((bs, pw_e, 128), slab.dtype)
    for r in range(8):
        prows = jnp.where(delta0 == r, slab[:, r : r + pw_e, :], prows)
    pet = _acc_dtype(dtype)  # int8 buffers correlate/demod through int32
    for r in range(pw_e):
        pw_scr[:, r * 128 : (r + 1) * 128] = prows[:, r, :]
    corr128 = jax.lax.dot_general(
        pw_scr[...],
        tband_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=pet,
    ).astype(jnp.float32)  # [bs, 128]: correlation at the 128 base-row lags
    # second lag block: lags 128..255 of the base row, from the one-row-
    # shifted probe rows. Needed whenever the per-stream servo window
    # [lo0, lo0 + n_lags) crosses the 128-lane row boundary (residues
    # lo0 > 128 - n_lags): the base-row correlation alone never probes
    # those upper lags — at residues 126-127 the predicted start itself
    # was invisible, so such streams either failed the probe every chunk
    # (silent full-search fallback) or locked 1-2 samples early
    # (round-4 ADVICE medium; equality test at residues 124..127 in
    # tests/test_stream_lock.py).
    prows2 = jnp.zeros((bs, pw_e, 128), slab.dtype)
    for r in range(8):
        prows2 = jnp.where(delta0 == r, slab[:, r + 1 : r + 1 + pw_e, :], prows2)
    for r in range(pw_e):
        pw_scr[:, r * 128 : (r + 1) * 128] = prows2[:, r, :]
    corr256 = jax.lax.dot_general(
        pw_scr[...],
        tband_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=pet,
    ).astype(jnp.float32)  # [bs, 128]: correlation at lags 128..255
    # per-stream servo window [lo0, lo0 + n_lags): mask, max, argmax —
    # the normalization scale is one value per stream, so the masked
    # argmax of |corr| IS the argmax of quality. The window is split
    # across the two lag blocks; ties keep the earlier lag (jnp.argmax
    # semantics), so block A wins on equality.
    lane = jax.lax.broadcasted_iota(jnp.int32, (bs, 128), 1)
    in_a = (lane >= lo0) & (lane < lo0 + n_lags)
    in_b = (lane + 128 >= lo0) & (lane + 128 < lo0 + n_lags)
    cabs_a = jnp.where(in_a, jnp.abs(corr128), -1.0)
    cabs_b = jnp.where(in_b, jnp.abs(corr256), -1.0)
    max_a = jnp.max(cabs_a, axis=1)
    max_b = jnp.max(cabs_b, axis=1)
    arg_a = jnp.argmax(cabs_a, axis=1).astype(jnp.int32)
    arg_b = jnp.argmax(cabs_b, axis=1).astype(jnp.int32)
    use_b = max_b > max_a
    cmax_ref[...] = jnp.maximum(max_a, max_b).reshape(bs, 1)
    offabs = jnp.where(use_b, arg_b + 128, arg_a)  # [bs]
    off = jnp.clip(offabs - lo0[:, 0], 0, n_lags - 1)
    off_ref[...] = off.reshape(bs, 1)
    pf = prows.astype(jnp.float32)
    sq = pf * pf
    en_ref[...] = jnp.sum(jnp.sum(sq, axis=2), axis=1).reshape(bs, 1)

    # --- demod at st0 + off: shift-the-slab with the refined offset ---
    fine = stv + off[:, None] + pre_rows * 128  # [bs, 1] absolute offset
    lo1 = jax.lax.rem(fine, 128).reshape(bs, 1, 1)
    j_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 128, 128), 1)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (bs, 128, 128), 2)
    sh_lo = (j_io == c_io + lo1).astype(dtype)
    sh_hi = (j_io == c_io + lo1 - 128).astype(dtype)
    shifted = (
        jax.lax.dot_general(
            slab[:, : sv - 1, :], sh_lo,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=pet,
        )
        + jax.lax.dot_general(
            slab[:, 1:sv, :], sh_hi,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=pet,
        )
    ).astype(slab.dtype)  # [bs, sv-1, 128]
    # row of the refined data start within the slab:
    # div(st0+off+pre,128) - hb8 = delta0 + pre_rows + carry(lo0+off)
    rowv = (
        jax.lax.rem(jax.lax.div(stv, 128), 8)
        + pre_rows
        + jax.lax.div(jax.lax.rem(stv, 128) + off[:, None], 128)
    ).reshape(bs, 1, 1)  # in [pre_rows, pre_rows + 8]
    srows = jnp.zeros((bs, pv, 128), slab.dtype)
    for r in range(pre_rows, pre_rows + 9):
        srows = jnp.where(rowv == r, shifted[:, r : r + pv, :], srows)

    iq = (
        jax.lax.dot_general(
            srows.reshape(bs * pv, 128),
            bbase_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=pet,
        )
        .astype(jnp.float32)
        .reshape(bs, pv, r2m)
    )
    for u in range(r_syms):
        iqu = iq[:, :, u * 2 * m : (u + 1) * 2 * m]
        i_part = iqu[:, :, :m]
        q_part = iqu[:, :, m:]
        e = i_part * i_part + q_part * q_part
        tone_ref[:, u * pp : u * pp + pv] = jnp.argmax(e, axis=-1).astype(
            jnp.int32
        )
        best_ref[:, u * pp : u * pp + pv] = jnp.max(e, axis=-1)
        total_ref[:, u * pp : u * pp + pv] = jnp.sum(e, axis=-1)
        if pp > pv:
            tone_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                (bs, pp - pv), jnp.int32
            )
            best_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                (bs, pp - pv), jnp.float32
            )
            total_ref[:, u * pp + pv : (u + 1) * pp] = jnp.zeros(
                (bs, pp - pv), jnp.float32
            )


@functools.partial(
    jax.jit,
    static_argnums=(0, 3),
    static_argnames=("n_lags", "start_bound", "batch_tile", "interpret"),
)
def demod_probe_fused(
    config: ModemConfig,
    buffer: jnp.ndarray,
    st0: jnp.ndarray,
    n_symbols: int,
    template: jnp.ndarray,
    *,
    n_lags: int = 5,
    start_bound: int | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Merged frame-lock probe + align+demod (see _demod_probe_kernel).

    Returns (cmax f32 [...], off i32 [...], energy f32 [...], tone, best,
    total): cmax is the maximum RAW |correlation| over the n_lags servo
    window, off its winning lag (0..n_lags-1), energy the row-aligned
    superset window energy (normalize outside: q = cmax * rsqrt(te *
    max(energy, 1e-4 te)) — same bound class as
    sync.preamble_quality_probe's blockwise form), and the demod triple
    is evaluated at start = st0 + off — the drift-servo-refined position
    the locked stream demodulates anyway.

    Requires 128 %% sps == 0, preamble_samples %% 128 == 0, n_lags <= 8.
    The stream carry's demod_at_buffer_pad covers this kernel's span (it
    budgets the extra preamble rows); foreign buffers fall back to an
    in-call pad copy.

    int8 buffers (stream.quantize_int8) run the whole kernel on the
    int8 x int8 -> int32 MXU path: the template quantizes to x127 in
    this wrapper (cmax is rescaled back so the caller's normalization
    against the FLOAT template energy still cancels the buffer scale),
    the basis takes decide_frame_tm's x127 int8 form, and the one-hot
    permutes stay exact. Servo offsets and tone decisions match the
    bf16 kernel bit-for-bit at operating noise
    (tests/test_stream_int8.py, tools/tpu_validate.py).
    """
    pre = config.preamble_symbols * config.samples_per_symbol
    if pre % 128:
        raise ValueError("demod_probe_fused needs preamble_samples % 128 == 0")
    if not 1 <= n_lags <= 8:
        raise ValueError("n_lags must be in [1, 8]")
    (batch_shape, xr, st, b, bs, sv0, pv, pp, r_syms, m, _pre, blocks) = (
        _demod_at_setup(config, buffer, st0, n_symbols, start_bound, batch_tile)
    )
    pre_rows = pre // 128
    sv = sv0 + pre_rows + 8
    k = template.shape[-1]
    pw_e = -(-(k + n_lags - 1) // 128) + 1
    # extra span rows past _demod_at_setup's budget: exactly 8 more (the
    # probe base sits up to 8 rows before the demod base; pre % 128 == 0
    # makes the rest cancel). demod_at_buffer_pad budgets these, so the
    # stream's carry buffer triggers no copy here.
    if start_bound is not None:
        need = max(int(start_bound), 0) // 128 + sv
        pad_rows = max(0, need - xr.shape[1])
    else:
        pad_rows = 8
    if pad_rows:
        xr = jnp.pad(xr, ((0, 0), (0, pad_rows), (0, 0)))

    if xr.dtype == jnp.int8:
        # int8 stream buffer: quantize the template to int8 (x127/max)
        # for the int8 x int8 -> int32 correlation, then undo the
        # TEMPLATE quantization on cmax below so the caller's
        # q = cmax * rsqrt(t_energy * energy) normalization (f32
        # template energy, int8-buffer-unit window energy) still
        # cancels the BUFFER scale between cmax and sqrt(energy).
        tmax = jnp.maximum(jnp.max(jnp.abs(template.astype(jnp.float32))), 1e-20)
        tvals = jnp.round(template.astype(jnp.float32) * (127.0 / tmax))
        cmax_scale = tmax / 127.0
    else:
        tvals = template
        cmax_scale = None
    tnp_j = jnp.arange(pw_e * 128)[:, None]
    tnp_c = jnp.arange(128)[None, :]
    tj = tnp_j - tnp_c
    tband = jnp.where(
        (tj >= 0) & (tj < k),
        tvals[jnp.clip(tj, 0, k - 1)],
        jnp.zeros((), tvals.dtype),
    ).astype(xr.dtype)

    bbase = jnp.concatenate(blocks, axis=1).astype(xr.dtype)  # [128, r2m]
    ncells = xr.shape[0] // bs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncells,),
        in_specs=[
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((pw_e * 128, 128), lambda i, st: (0, 0)),
            pl.BlockSpec((128, 2 * m * r_syms), lambda i, st: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
            pl.BlockSpec((bs, 1), lambda i, st: (i, 0)),
            pl.BlockSpec((bs, r_syms * pp), lambda i, st: (i, 0)),
            pl.BlockSpec((bs, r_syms * pp), lambda i, st: (i, 0)),
            pl.BlockSpec((bs, r_syms * pp), lambda i, st: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bs, sv, 128), xr.dtype),
            pltpu.SemaphoreType.DMA((2, bs)),
            pltpu.VMEM((bs, pw_e * 128), xr.dtype),
        ],
    )
    cmax, off, en, tone, best, total = pl.pallas_call(
        functools.partial(
            _demod_probe_kernel,
            bs=bs, sv=sv, pv=pv, pp=pp, pw_e=pw_e, r_syms=r_syms, m=m,
            pre_rows=pre_rows, n_lags=n_lags, ncells=ncells,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((xr.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((xr.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((xr.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((xr.shape[0], r_syms * pp), jnp.int32),
            jax.ShapeDtypeStruct((xr.shape[0], r_syms * pp), jnp.float32),
            jax.ShapeDtypeStruct((xr.shape[0], r_syms * pp), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(st, st.reshape(-1, 1), xr, tband, bbase)

    def _unpack(o):
        o3 = o[:b].reshape(b, r_syms, pp)
        o3 = jnp.moveaxis(o3, 1, 2).reshape(b, pp * r_syms)[:, :n_symbols]
        return o3.reshape(batch_shape + (n_symbols,))

    if cmax_scale is not None:
        cmax = cmax * cmax_scale
    return (
        cmax[:b, 0].reshape(batch_shape),
        off[:b, 0].reshape(batch_shape),
        en[:b, 0].reshape(batch_shape),
        _unpack(tone),
        _unpack(best),
        _unpack(total),
    )


def demod_at_buffer_pad(
    config: ModemConfig, n_symbols: int, start_bound: int, live_length: int
) -> int:
    """Extra zero samples a ``live_length``-sample buffer needs so
    demod_at_fused (called with this ``start_bound``) performs NO
    in-step pad copies: lane alignment to 128 plus enough tail rows that
    every span DMA stays inside the array. The streaming receiver sizes
    its carry buffer with this (anet.stream._buffer_len); the arithmetic
    mirrors demod_at_fused's internal pad computation exactly."""
    sps = config.samples_per_symbol
    r_syms = 128 // sps
    pre = config.preamble_symbols * sps
    p = -(-n_symbols // r_syms)
    pv = -(-p // 8) * 8
    sv = (-(-(pv + 2) // 8)) * 8 + 8
    lane_pad = -live_length % 128
    rows_total = (live_length + lane_pad) // 128
    hi_max = (start_bound + pre) // 128
    # +8 rows: the merged probe+demod kernel (demod_probe_fused) DMAs
    # from the PROBE base (st0 // 128, before the preamble) with a span
    # that ends up to 8 rows past the demod-only kernel's
    pad_rows = max(0, hi_max + sv + 8 - rows_total)
    return lane_pad + pad_rows * 128


# --- fused OFDM equalize + clock-track + decide -------------------------------

OFDM_STREAM_TILE = 128  # streams per grid cell


_QPSK_AMP = 0.7071067811865476  # 1/sqrt(2), unit average symbol power
_QAM16_SCALE = 0.31622776601683794  # 1/sqrt(10)
_QAM64_SCALE = 0.1543033499620919  # 1/sqrt(42)


def _qam_nearest(a, scale: float, max_level: float):
    """ofdm._hard_decision's per-axis nearest odd point (round-half-even)."""
    return jnp.clip(2.0 * jnp.round((a / scale - 1.0) / 2.0) + 1.0,
                    -max_level, max_level) * scale


def _decide_axis(a, bpc: int):
    """Per-axis hard decision used INSIDE the tracking iterations —
    mirrors ofdm._hard_decision exactly (>= 0 sign rule, round-half-even
    for the QAM magnitudes)."""
    if bpc == 2:
        return jnp.where(a >= 0, _QPSK_AMP, -_QPSK_AMP)
    if bpc == 4:
        return _qam_nearest(a, _QAM16_SCALE, 3.0)
    return _qam_nearest(a, _QAM64_SCALE, 7.0)


def _ideal_axis(a, bpc: int):
    """Per-axis constellation point implied by the LLR-sign bits — mirrors
    bits_to_carriers(llrs > 0) exactly, including the strict-> boundaries
    (so the kernel's EVM equals ofdm._evm_metrics bit for bit)."""
    if bpc == 2:
        # llr = -a*w; bit = llr > 0 <=> a < 0; ideal = 1-2b scaled
        return jnp.where(a < 0, -_QPSK_AMP, _QPSK_AMP)
    mag_a = jnp.abs(a)
    if bpc == 4:
        # b_inner = (2s - |a|) w > 0 <=> |a| < 2s; mag = 3 - 2 b_inner
        mag = jnp.where(mag_a < 2.0 * _QAM16_SCALE, 1.0, 3.0)
        sign = jnp.where(a > 0, 1.0, -1.0)  # b_sign = a w > 0
        return sign * mag * _QAM16_SCALE
    s = _QAM64_SCALE
    # b_mid = |a| < 4s (strict); b_inner = 2s < |a| < 6s (strict);
    # gray mag = 7 - 2*(2*mid + (mid ^ inner)) -> thresholds:
    mag = jnp.where(
        mag_a <= 2.0 * s,
        1.0,
        jnp.where(mag_a < 4.0 * s, 3.0, jnp.where(mag_a < 6.0 * s, 5.0, 7.0)),
    )
    sign = jnp.where(a > 0, 1.0, -1.0)
    return sign * mag * s


def _llr_axis(a, w, bpc: int):
    """Max-log LLR planes for one axis (ofdm._pam4_llrs/_pam8_llrs; for
    QPSK the golden uses the UNNORMALIZED z = z_eq * h_pow, i.e. -a*w)."""
    if bpc == 2:
        return (-(a * w),)
    if bpc == 4:
        return (a * w, (2.0 * _QAM16_SCALE - jnp.abs(a)) * w)
    mag = jnp.abs(a)
    return (
        a * w,
        (4.0 * _QAM64_SCALE - mag) * w,
        (2.0 * _QAM64_SCALE - jnp.abs(mag - 4.0 * _QAM64_SCALE)) * w,
    )


def _ofdm_track_kernel(
    slope_ref,
    zer_ref,
    zei_ref,
    hpow_ref,
    *out_refs,
    bs: int,
    sp: int,
    c: int,
    s_data: int,
    evm_rows: int,
    first_carrier: int,
    bpc: int,
    track_iters: int,
):
    """One cell: bs streams' [sp, c] equalized symbol estimates in VMEM.

    The decision-directed clock fit (ofdm._phase_track), the final
    derotation, the per-bit LLRs, and the EVM accumulate entirely in
    VMEM — the jnp formulation round-trips [B, S, C] complex through HBM
    at every fusion barrier (two fits x decide/reduce + rotate + LLR).
    """
    w = hpow_ref[...].reshape(bs, 1, c)
    zer = zer_ref[...]
    zei = zei_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (bs, sp, c), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (bs, sp, c), 2)
    # data symbol s (0-based; pilot = -1) at absolute carrier m rotates by
    # cc*(s+1)*m — see ofdm._phase_track
    phase = ((row + 1) * (col + first_carrier)).astype(jnp.float32)
    mask = (row < s_data).astype(jnp.float32)

    cc = slope_ref[...].astype(jnp.float32).reshape(bs, 1, 1)
    zr, zi = zer, zei
    for _ in range(track_iters):
        ang = cc * phase
        co = jnp.cos(ang)
        si = jnp.sin(ang)
        zr = zer * co + zei * si  # z_eq * exp(-i ang)
        zi = zei * co - zer * si
        dre = _decide_axis(zr, bpc)
        dim = _decide_axis(zi, bpc)
        # u = w * z_rot * conj(d)
        ure = w * (zr * dre + zi * dim)
        uim = w * (zi * dre - zr * dim)
        # single-axis reduces only: a multi-axis jnp.sum(axis=(1, 2)) on a
        # 3-D block SIGABRTs this runtime's remote Mosaic compiler (the
        # round-3 bisection that un-broke every OFDM path on chip)
        num = jnp.sum(
            jnp.sum(phase * uim * mask, axis=2), axis=1
        ).reshape(bs, 1, 1)
        den = jnp.maximum(
            jnp.sum(
                jnp.sum(phase * phase * jnp.maximum(ure, 0.0) * mask, axis=2),
                axis=1,
            ).reshape(bs, 1, 1),
            1e-20,
        )
        cc = cc + num / den
    if track_iters:
        ang = cc * phase
        co = jnp.cos(ang)
        si = jnp.sin(ang)
        zr = zer * co + zei * si
        zi = zei * co - zer * si

        # identity gate (mirrors ofdm._phase_track): keep the fitted
        # rotation only where it beats the UNROTATED constellation's
        # weighted decision coherence — a poison preamble seed locks the
        # fit onto its own rotation at low SNR; ties keep the identity.
        def _coh(ar, ai):
            dre = _decide_axis(ar, bpc)
            dim = _decide_axis(ai, bpc)
            ure = w * (ar * dre + ai * dim)
            uim = w * (ai * dre - ar * dim)
            uab = jnp.sqrt(ure * ure + uim * uim)
            s_re = jnp.sum(jnp.sum(ure * mask, axis=2), axis=1)
            s_ab = jnp.maximum(
                jnp.sum(jnp.sum(uab * mask, axis=2), axis=1), 1e-20
            )
            return s_re / s_ab

        keep = (_coh(zr, zi) > _coh(zer, zei)).reshape(bs, 1, 1)
        zr = jnp.where(keep, zr, zer)
        zi = jnp.where(keep, zi, zei)

    planes = _llr_axis(zr, w, bpc) + _llr_axis(zi, w, bpc)
    for ref, p in zip(out_refs[:-1], planes):
        ref[...] = p.astype(jnp.float32)
    # EVM vs the bits-implied ideal over the first evm_rows symbols
    ir = _ideal_axis(zr, bpc)
    ii = _ideal_axis(zi, bpc)
    emask = (row < evm_rows).astype(jnp.float32)
    er = zr - ir
    ei = zi - ii
    # two single-axis reduces (multi-axis reduce crashes Mosaic, see above)
    out_refs[-1][...] = jnp.sum(
        jnp.sum((er * er + ei * ei) * emask, axis=2), axis=1
    ).reshape(bs, 1)


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("evm_symbols", "batch_tile", "interpret"),
)
def ofdm_track_decide_fused(
    config,
    z_eq: jnp.ndarray,
    h_pow: jnp.ndarray,
    slope0: jnp.ndarray,
    *,
    evm_symbols: int | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """RETIRED measured record — NOT a production alternate. Fused OFDM
    clock-track + symbol decide (ofdm._phase_track + LLR demap +
    ofdm._evm_metrics' error power, one Pallas kernel).

    Golden-equal to the jnp equalizer but MEASURED ~2000x SLOWER on this
    runtime's Mosaic (10,065 ms vs 5.34 ms per tracked iteration at
    B=16384 — tools/exp_ofdm2.py; docs/PERF.md round-4 NULL #3): the
    decision-directed iterations are elementwise-transcendental work XLA
    already fuses well, and this kernel's per-cell serialization loses by
    three orders of magnitude. Kept as the measured record of that
    result. Never auto-dispatched; reachable only via ANET_OFDM_FUSED=1
    (ofdm._use_fused_track), and its tpu_validate check is opt-in under
    the same flag.

    Args:
      config: OfdmConfig (static).
      z_eq: complex64 [..., S, C] unit-constellation symbol estimates
        (carriers * conj(h) / |h|^2 — ofdm._equalized_bits before track).
      h_pow: float32 [..., C] per-carrier channel power (LLR weights and
        tracking reliabilities).
      slope0: float32 [...] preamble slope seed (ofdm.preamble_phase_slope);
        ignored when config.clock_tracking is False.
      evm_symbols: how many leading data symbols the EVM covers (the
        dynamic path scores only the overhead span); default all S.

    Returns:
      (llrs float32 [..., S*C*bits_per_carrier] — ofdm._equalized_bits'
      exact layout, evm2 float32 [...] — mean squared error vector the
      confidence/SNR metrics derive from).
    """
    bpc = config.bits_per_carrier
    track_iters = 2 if config.clock_tracking else 0
    c = config.n_carriers
    s = z_eq.shape[-2]
    evm_rows = s if evm_symbols is None else evm_symbols
    batch_shape = z_eq.shape[:-2]
    b = 1
    for d in batch_shape:
        b *= d

    sp = -(-s // 8) * 8
    ze = z_eq.reshape(b, s, c)
    if sp != s:  # zero rows: u = 0 there, so they never bias the fit
        ze = jnp.pad(ze, ((0, 0), (0, sp - s), (0, 0)))
    zer = jnp.real(ze).astype(jnp.float32)
    zei = jnp.imag(ze).astype(jnp.float32)
    hp = h_pow.reshape(b, c).astype(jnp.float32)
    sl = slope0.reshape(b, 1).astype(jnp.float32)

    bs = batch_tile or OFDM_STREAM_TILE
    pad_b = -b % bs
    if pad_b:
        zer = jnp.pad(zer, ((0, pad_b), (0, 0), (0, 0)))
        zei = jnp.pad(zei, ((0, pad_b), (0, 0), (0, 0)))
        hp = jnp.pad(hp, ((0, pad_b), (0, 0)))
        sl = jnp.pad(sl, ((0, pad_b), (0, 0)))
    bt = zer.shape[0]

    n_planes = bpc  # per-axis planes x 2 axes = bits per carrier
    grid = (bt // bs,)
    outs = pl.pallas_call(
        functools.partial(
            _ofdm_track_kernel,
            bs=bs,
            sp=sp,
            c=c,
            s_data=s,
            evm_rows=evm_rows,
            first_carrier=config.first_carrier,
            bpc=bpc,
            track_iters=track_iters,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bt, sp, c), jnp.float32) for _ in range(n_planes)
        )
        + (jax.ShapeDtypeStruct((bt, 1), jnp.float32),),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, 1), lambda i: (i, 0)),
            pl.BlockSpec((bs, sp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bs, sp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bs, c), lambda i: (i, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((bs, sp, c), lambda i: (i, 0, 0)) for _ in range(n_planes)
        )
        + (pl.BlockSpec((bs, 1), lambda i: (i, 0)),),
        interpret=interpret,
    )(sl, zer, zei, hp)

    planes = [o[:b, :s, :] for o in outs[:-1]]
    evm_sum = outs[-1][:b, 0]
    half = n_planes // 2
    # golden layout: stack([i planes..., q planes...], -1) -> [.., S*C*bpc]
    llrs = jnp.stack(planes[:half] + planes[half:], axis=-1).reshape(
        b, s * c * bpc
    )
    evm2 = evm_sum / (evm_rows * c)
    return (
        llrs.reshape(batch_shape + (s * c * bpc,)),
        evm2.reshape(batch_shape),
    )

