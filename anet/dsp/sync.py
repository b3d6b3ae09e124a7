"""Preamble synchronization: detection + timing estimation.

The PHY-layer analog of the reference's magic-word filtering on discovery
datagrams (discovery.kt:87-89, network.cpp:474-484): a receiver locks onto
a frame only after the known preamble correlates above threshold.

The preamble is a fixed PN tone pattern — maximally distinctive against
both noise and the data section. Three correlation backends:

- ``matmul`` — block-Toeplitz matched filter: the lag axis is tiled into
  MXU-sized blocks and each block of lags is one ``[n_blocks, K+B-1] x
  [K+B-1, B]`` matmul against a banded template matrix. O(N*K) FLOPs but
  they are *matmul* FLOPs, so on TPU this is the fast path — and the only
  one that runs on backends where ``irfft`` is unimplemented (the remote
  TPU plugin, CLAUDE.md). The streaming receiver's hot loop uses it.
- ``fft`` — rfft multiply irfft, O(N log N); best for long one-shot
  captures on CPU.
- ``direct`` — materialized sliding windows; golden model for tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from anet.dsp.mod import synthesize_tones
from anet.dsp.params import ModemConfig


def preamble_tone_indices(config: ModemConfig) -> jnp.ndarray:
    """Fixed pseudo-noise tone pattern for the preamble.

    A periodic pattern (e.g. alternating low/high tones) has autocorrelation
    sidelobes at every pattern-period shift, which cause false locks when a
    frame is partially inside a correlation window. A fixed PN sequence over
    the full tone alphabet keeps sidelobes at ~1/sqrt(preamble_samples), so
    the normalized sync quality is sharply peaked at the true offset. The
    seed is a protocol constant (derived from the wire magic word) — both
    ends must generate the identical pattern.
    """
    import numpy as np

    rng = np.random.default_rng(0x2C5DA044)
    pattern = rng.integers(0, config.num_tones, config.preamble_symbols)
    return jnp.asarray(pattern, dtype=jnp.int32)


def preamble_waveform(config: ModemConfig, dtype=jnp.float32) -> jnp.ndarray:
    """The known preamble template, [preamble_samples]."""
    return synthesize_tones(config, preamble_tone_indices(config), dtype=dtype)


class SyncResult(NamedTuple):
    """Timing estimate for one stream (all fields batched alike)."""

    offset: jnp.ndarray  # int32 — sample index where the preamble starts
    frac: jnp.ndarray  # float32 — sub-sample refinement in (-0.5, 0.5)
    quality: jnp.ndarray  # float32 — normalized correlation in [0, 1]


def correlate_template(
    samples: jnp.ndarray,
    template: jnp.ndarray,
    method: str = "fft",
    fft_len: int | None = None,
    block: int | None = None,
) -> jnp.ndarray:
    """Cross-correlate [..., N] samples with a [K] template.

    Returns [..., N - K + 1] valid-mode correlation (float32).

    method="matmul" is the TPU path (see module docstring); ``block`` is
    its lag-tile width (lane-aligned, default min(512, out_len) rounded to
    128). method="fft": the default FFT size next_pow2(N + K - 1) avoids
    all circular wraparound; callers that only consume the valid lags
    [0, N - K] may pass fft_len = next_pow2(N) — the aliased contributions
    land outside that range.
    """
    n = samples.shape[-1]
    k = template.shape[-1]
    if k > n:
        raise ValueError(f"template ({k}) longer than capture ({n})")
    if method == "auto":
        # FFT wins for long one-shot captures on CPU; the remote TPU
        # backend has no irfft at all (CLAUDE.md), and the MXU makes the
        # block-Toeplitz matmul the fast path there anyway.
        import jax

        method = "fft" if jax.default_backend() == "cpu" else "matmul"
    if method == "direct":
        windows = _sliding_windows(samples, k)  # [..., N-K+1, K]
        return jnp.einsum("...nk,k->...n", windows, template)
    if method == "matmul":
        return _correlate_matmul(samples, template, block)
    # FFT path: correlation = irfft(rfft(x) * conj(rfft(template)))
    if fft_len is None:
        fft_len = _next_pow2(n + k - 1)
    elif fft_len < n:
        raise ValueError(f"fft_len {fft_len} shorter than the capture ({n})")
    spec_x = jnp.fft.rfft(samples, n=fft_len, axis=-1)
    spec_t = jnp.fft.rfft(template, n=fft_len)
    corr = jnp.fft.irfft(spec_x * jnp.conj(spec_t), n=fft_len, axis=-1)
    return corr[..., : n - k + 1]


def _correlate_matmul(
    samples: jnp.ndarray, template: jnp.ndarray, block: int | None = None
) -> jnp.ndarray:
    """Valid-mode correlation as a block-Toeplitz matmul (MXU-native).

    For a block of B consecutive lags starting at m*B:
      corr[mB + j] = sum_k x[mB + j + k] * t[k]   (j in [0, B))
    which is one row of Y @ T with
      Y[m, p] = x[m*B + p]            (p in [0, K+B-1))   — overlapped rows
      T[p, j] = t[p - j] if 0 <= p-j < K else 0           — banded, static
    so the whole correlation is a single [..., n_blocks, K+B-1] x
    [K+B-1, B] contraction: large, static, and tiled by XLA straight onto
    the MXU. Y is assembled from shifted reshapes of the padded input
    (slices + concat — no gather), costing a ~(K/B + 1)x data expansion in
    exchange for contraction dims in the hundreds-to-thousands.
    """
    n = samples.shape[-1]
    k = template.shape[-1]
    out_len = n - k + 1
    if block is None:
        block = min(512, max(128, _next_pow2(out_len)))
    b = block
    n_blocks = -(-out_len // b)
    w = k + b - 1  # overlapped row width
    r = -(-w // b)  # shifted reshapes needed to cover a row
    pad = (n_blocks + r) * b - n
    x = jnp.pad(samples, [(0, 0)] * (samples.ndim - 1) + [(0, max(pad, 0))])
    xr = x.reshape(x.shape[:-1] + (n_blocks + r, b))
    # Y[m] = x[m*b : m*b + w]: r shifted views of the reshaped rows.
    y = jnp.concatenate(
        [xr[..., s : s + n_blocks, :] for s in range(r)], axis=-1
    )[..., :w]
    tmat = banded_template(template, w, b)
    corr = jnp.einsum(
        "...mw,wj->...mj", y, tmat, preferred_element_type=jnp.float32
    )
    return corr.reshape(samples.shape[:-1] + (n_blocks * b,))[..., :out_len]


def banded_template(template: jnp.ndarray, n_rows: int, block: int) -> jnp.ndarray:
    """Banded Toeplitz template matrix [n_rows, block]: T[p, j] = t[p - j]
    inside the band, 0 outside — a trace-time constant under jit.

    The single source of truth for the block-Toeplitz correlation band
    layout, shared by the jnp golden model (_correlate_matmul) and the
    Pallas kernel (anet.kernels.correlate_fused) so the two can never
    desynchronize.
    """
    k = template.shape[-1]
    p = jnp.arange(n_rows)[:, None]
    j = jnp.arange(block)[None, :]
    idx = p - j
    return jnp.where(
        (idx >= 0) & (idx < k),
        template[jnp.clip(idx, 0, k - 1)],
        jnp.zeros((), template.dtype),
    )


def _sliding_windows(samples: jnp.ndarray, k: int) -> jnp.ndarray:
    n = samples.shape[-1]
    starts = jnp.arange(n - k + 1)
    offsets = jnp.arange(k)
    idx = starts[:, None] + offsets[None, :]
    return samples[..., idx]


def sliding_window_energy(samples: jnp.ndarray, k: int) -> jnp.ndarray:
    """Energy of every k-sample window: [..., N] -> [..., N - k + 1] (f32).

    Built on a prefix sum of the squared samples. On TPU a minor-axis
    ``cumsum`` lowers to a long relayout chain (measured 4.4 Gsamp/s at
    the streaming receiver's working size — a top-2 cost); the blocked
    matmul prefix sum below reaches ~9 G. CPU keeps the plain cumsum.
    """
    sq = samples * samples
    if jax.default_backend() == "cpu":
        csum = jnp.cumsum(sq.astype(jnp.float32), axis=-1)
    else:
        csum = _blocked_cumsum(sq)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    return csum[..., k:] - csum[..., : csum.shape[-1] - k]


def _blocked_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis as two triangular matmuls.

    Reshape to [..., rows, 128]; within-row prefix = one [128, 128]
    upper-triangular matmul (MXU), cross-row carry = a strictly-upper
    [rows, rows] matmul on the row totals, broadcast back. Accumulation is
    f32 (preferred_element_type) whatever the input dtype; output f32.
    """
    n = x.shape[-1]
    pad = (-n) % _LANE
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    m = xp.shape[-1] // _LANE
    xr = xp.reshape(xp.shape[:-1] + (m, _LANE))
    triu = jnp.triu(jnp.ones((_LANE, _LANE), x.dtype))
    within = jnp.einsum(
        "...mj,ji->...mi", xr, triu, preferred_element_type=jnp.float32
    )
    row_tot = within[..., -1]  # [..., m]
    carry = jnp.triu(jnp.ones((m, m), jnp.float32), k=1)
    row_pref = jnp.einsum(
        "...m,mn->...n", row_tot, carry, preferred_element_type=jnp.float32
    )
    out = within + row_pref[..., None]
    return out.reshape(x.shape[:-1] + (m * _LANE,))[..., :n]


def blockwise_match_quality(
    seg: jnp.ndarray,
    corr: jnp.ndarray,
    k: int,
    template_energy: jnp.ndarray,
) -> jnp.ndarray:
    """normalized_match_quality with the window energy at 128-lag
    granularity — the streaming hot path's form.

    The exact per-lag energy needs a full prefix sum over the segment
    (measured 18 ms/step at the bench working size, a top-3 cost) and its
    per-lag broadcast is a lane relayout. Detection only needs the energy
    to ~ the threshold margin, so: square once, sum per 128-sample block,
    slide over ceil(k/128)+1 blocks (a strict superset of every window
    starting in the block — energy only ever OVER-counts, by up to
    (ceil(k/128)+1)*128 - k extra samples, i.e. <=255/k: ~12% energy /
    ~6% quality reduction for the 2048-sample preamble, vs a
    0.45-vs-~1.0 threshold margin), and broadcast per block in the RESHAPED [.., nb,
    128] view, where the broadcast is over the free minor axis — no
    relayout anywhere.

    ``corr`` is the valid-lag correlation [.., out_len] of ``seg`` with a
    k-sample template; a non-128-multiple out_len is zero-padded (the
    streaming receiver's chunk sizes are lane-aligned anyway).
    """
    out_len = corr.shape[-1]
    out_pad = -out_len % _LANE
    if out_pad:
        corr = jnp.pad(corr, [(0, 0)] * (corr.ndim - 1) + [(0, out_pad)])
    nb_out = (out_len + out_pad) // _LANE
    kb = -(-k // _LANE) + 1  # blocks per window: superset of any start
    need = (nb_out - 1 + kb + 1) * _LANE
    sq = (seg * seg).astype(jnp.float32)
    pad = need - sq.shape[-1]
    if pad > 0:
        sq = jnp.pad(sq, [(0, 0)] * (sq.ndim - 1) + [(0, pad)])
    blocks = sq[..., :need].reshape(*sq.shape[:-1], need // _LANE, _LANE).sum(-1)
    csum = jnp.cumsum(blocks, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    win = csum[..., kb : kb + nb_out] - csum[..., :nb_out]  # [.., nb_out]
    floored = jnp.maximum(win, 1e-4 * template_energy)
    scale = jax.lax.rsqrt(template_energy * floored)  # [.., nb_out]
    q = jnp.abs(corr).reshape(*corr.shape[:-1], nb_out, _LANE) * scale[..., None]
    return q.reshape(corr.shape)[..., :out_len]


def preamble_quality_probe(
    buffer: jnp.ndarray,
    start: jnp.ndarray,
    template: jnp.ndarray,
    template_energy,
    n_lags: int = 5,
    compute_dtype=None,
    mode: str = "auto",
    start_bound: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized preamble match quality at ``n_lags`` consecutive lags
    around per-stream ``start`` — the frame-lock verify/refine probe.

    Where the full search scores EVERY lag in a chunk, a locked stream
    already knows where its next frame should begin (the reference's TCP
    reader never re-synchronizes — network.cpp:409-430 trusts the framing
    after connect); it only needs (a) confirmation that a preamble really
    is there and (b) a few lags of slack to servo out clock drift. Returns
    ``(q, st0)``: q[..., o] is the quality at buffer index st0 + o with
    st0 = clip(start - n_lags//2, 0, length - k - n_lags + 1).

    Quality semantics match blockwise_match_quality's superset-energy
    form: ONE window energy per stream, summed over the row-aligned span
    [128*(st0//128), 128*(st0//128 + ceil((k+n_lags-1)/128) + 1)) — a
    strict superset of every probed window, so quality only ever
    under-reports, by the same ~6% bound as the streaming search. The
    detection threshold applies unchanged.

    Callers guarantee start + k + n_lags + 128 <= buffer length (true for
    any in-window frame start, since frames are far longer than their
    preamble). ``start_bound`` (static) is the maximum ``start`` the
    caller can produce; pass it whenever the probed region is a small
    prefix of a long buffer — the probe then touches only the rows a
    bounded start can reach, instead of the whole buffer twice (at the
    streaming bench geometry the unbounded form cost 16 ms/step: a
    full-buffer pad copy inside aligned_gather plus a full-buffer
    one-hot read, for a ~1 KB answer). ``mode="fused"`` forces the
    span-DMA Pallas kernel (anet.kernels.probe_at_fused — the round-4
    restructuring of the retired batch-dot probe kernel whose lowering
    SIGABRTed this runtime's Mosaic); its window-energy superset is
    st0-aligned rather than row-aligned, the same under-report bound
    class. "auto" takes the jnp form below, whose probe ops are
    themselves MXU-native: row-aligned span slab once, lane-shift out of
    the span (not a second full-buffer gather), and all n_lags
    correlations as ONE shifted-template matmul — no minor-axis index
    gather anywhere. (The TPU streaming hot paths dispatch their own
    kernels in anet.stream and don't come through here.)
    """
    k = template.shape[-1]
    length = buffer.shape[-1]
    h = n_lags // 2
    st = start.astype(jnp.int32)
    st0 = jnp.clip(st - h, 0, length - k - n_lags + 1)
    t_c = template.astype(compute_dtype) if compute_dtype else template
    te = jnp.asarray(template_energy, jnp.float32)
    if mode == "fused":
        from anet.kernels import probe_at_fused

        buf_c = buffer.astype(compute_dtype) if compute_dtype else buffer
        return (
            probe_at_fused(
                buf_c, st0, t_c, te, n_lags,
                start_bound=start_bound,
            ),
            st0,
        )
    span_rows = -(-(k + n_lags - 1) // _LANE) + 1
    row0 = st0 // _LANE
    if start_bound is not None:
        # Static head slice: a bounded start can only read rows
        # [0, bound_row + span_rows + 1); the one-hot row selection then
        # contracts against this prefix instead of the full buffer, and
        # the bound lets aligned_gather skip its safety pad copy.
        bound0 = min(max(int(start_bound), 0), length - k - n_lags + 1)
        head_rows = bound0 // _LANE + span_rows + 1
        if head_rows * _LANE < length:
            buffer = buffer[..., : head_rows * _LANE]
    span = aligned_gather(
        buffer,
        row0 * _LANE,
        span_rows * _LANE,
        compute_dtype,
        start_bound=None if start_bound is None else bound0 // _LANE * _LANE,
    )
    span_f = span.astype(jnp.float32)
    energy = jnp.sum(span_f * span_f, axis=-1)
    # windows come out of the already-gathered span (37 MB at bench size)
    # by fine lane shift, instead of a second full-buffer (GB-scale) pass
    wins = aligned_gather(
        span,
        st0 - row0 * _LANE,
        k + n_lags - 1,
        compute_dtype,
        start_bound=_LANE - 1,
    )
    # tsh[j, o] = template[j - o]: every probed lag is one column of a
    # single [k+n_lags-1, n_lags] matmul. The [n_lags, k] window-index
    # form (wins[..., idx]) is a minor-axis gather — the ~0.2 GB/s
    # scalar-core pathology aligned_gather exists to avoid.
    jj = jnp.arange(k + n_lags - 1)[:, None]
    oo = jnp.arange(n_lags)[None, :]
    tj = jj - oo
    tsh = jnp.where(
        (tj >= 0) & (tj < k), t_c[jnp.clip(tj, 0, k - 1)], jnp.zeros((), t_c.dtype)
    )
    corr = jnp.einsum("...j,jo->...o", wins, tsh, preferred_element_type=jnp.float32)
    floored = jnp.maximum(energy, 1e-4 * te)
    q = jnp.abs(corr) * jax.lax.rsqrt(te * floored)[..., None]
    return q, st0


def normalized_match_quality(
    corr: jnp.ndarray, window_energy: jnp.ndarray, template_energy: jnp.ndarray
) -> jnp.ndarray:
    """Cauchy-Schwarz-normalized correlation quality in [0, 1].

    The window energy is floored at -40 dB of the template energy so
    near-silent windows cannot divide FFT roundoff by ~zero and report
    spurious quality; a real preamble at any receivable level clears the
    floor. Shared by the one-shot locator and the streaming receiver.
    """
    floored = jnp.maximum(window_energy, 1e-4 * template_energy)
    return jnp.abs(corr) / jnp.sqrt(template_energy * floored)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


_LANE = 128  # TPU lane width; the coarse/fine split of aligned_gather


def aligned_gather(
    buffer: jnp.ndarray,
    start: jnp.ndarray,
    size: int,
    compute_dtype=None,
    mode: str = "auto",
    start_bound: int | None = None,
) -> jnp.ndarray:
    """Slice ``size`` samples starting at per-stream dynamic offsets:
    out[..., i] = buffer[..., start[...] + i]. Callers guarantee
    start + size <= buffer length.

    This is the timing-alignment step between sync and demod, and it is
    hot: a plain ``take_along_axis`` over the minor (lane) axis lowers to
    a scalar-core gather — measured ~0.2 GB/s on v5e, 800 ms per stream
    step, the whole streaming receiver's bottleneck. Instead split each
    start into a coarse row index (multiple of 128) and a fine lane
    offset:

    - coarse: one [rows, 128] slab per stream via vmapped dynamic_slice —
      consecutive rows, so XLA lowers it to one big DMA per stream;
    - fine: shift by ``start % 128`` lanes with a pair of one-hot
      selection matmuls (this row and the next) — MXU work, and *exact*
      at the default f32 path (``Precision.HIGHEST``: every product is
      1.0 * x or 0.0 * x, and f32 operands split losslessly into bf16
      triples).

    ~80x faster than the lane gather on the chip, and the same code path
    runs on CPU (where both pieces are cheap). Pass
    ``compute_dtype=jnp.bfloat16`` to run the selection matmuls in bf16
    (faster; output then equals the bf16-rounded samples — free when the
    consumer demodulates in bf16 anyway).
    """
    if start.ndim == 0:
        return jax.lax.dynamic_slice_in_dim(buffer, start, size, axis=-1)
    if compute_dtype is None or compute_dtype == jnp.float32:
        sel_dtype, precision = buffer.dtype, jax.lax.Precision.HIGHEST
    else:
        sel_dtype, precision = compute_dtype, None
    batch = 1
    for d in start.shape:
        batch *= d
    if mode not in ("auto", "dma", "onehot", "roll"):
        raise ValueError(f"mode must be auto/dma/onehot/roll, got {mode!r}")
    if mode == "auto":
        mode = (
            "onehot"
            if sel_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and batch >= 512
            else "dma"
        )
    if mode == "roll":
        # Pallas roll-align kernel: exact in any dtype (pure data
        # movement). Measured SLOWER than the one-hot on chip at the
        # stream bench size (30 vs 26 ms at B=8192 — the per-stream
        # slice+roll loop serializes); kept as an explicit mode for
        # small-batch / f32-exact callers, not in auto.
        from anet.kernels import gather_rows_fused

        return gather_rows_fused(buffer, start, size)
    out_pad = -(-size // _LANE) * _LANE
    rt = out_pad // _LANE
    length = buffer.shape[-1]
    # Pad so every coarse read (incl. the +1 slack row when start % 128
    # == 0) stays in range; padded lanes only ever multiply a 0 weight.
    # ``start_bound`` (static max start) skips the pad when it proves
    # every read in-range already — the pad is a FULL buffer copy, which
    # at streaming sizes costs more than the gather itself.
    pad = (-length) % _LANE + _LANE
    if (
        start_bound is not None
        and length % _LANE == 0
        and start_bound // _LANE + rt + 1 <= length // _LANE
    ):
        pad = 0
    x = (
        buffer
        if pad == 0
        else jnp.pad(buffer, [(0, 0)] * (buffer.ndim - 1) + [(0, pad)])
    )
    rows_total = x.shape[-1] // _LANE
    xr = x.reshape(x.shape[:-1] + (rows_total, _LANE))
    hi = start // _LANE
    lo = start % _LANE
    # (A two-level variant — 32-row group shift then in-group row shift,
    # keeping every one-hot tiny — measured SLOWER on chip than the flat
    # one-hot: 40 vs 23 ms at the bench size; the extra [.., ng*32, 128]
    # intermediates cost more than the big selection tensor saves.)
    if mode == "onehot":
        # Row selection as a batched one-hot matmul. The vmapped
        # dynamic_slice below issues ONE small DMA PER STREAM (~5 us each
        # — 40 ms/step at the bench's 8192 streams, the streaming
        # receiver's single largest cost); the one-hot contraction moves
        # the same rows as a few large MXU ops instead (~4x faster
        # measured). Only worth it when the per-stream DMA count bites
        # and bf16 halves the one-hot's footprint.
        rows_total = xr.shape[-2]
        ridx = hi[..., None] + jnp.arange(rt + 1)  # [..., rt+1]
        onehot = (
            ridx[..., None] == jnp.arange(rows_total)
        ).astype(sel_dtype)  # [..., rt+1, rows_total]
        rows = jnp.einsum(
            "...rh,...hp->...rp",
            onehot,
            xr.astype(sel_dtype),
            preferred_element_type=jnp.float32,
        ).astype(sel_dtype)
    else:
        slab = lambda xb, h: jax.lax.dynamic_slice(xb, (h, 0), (rt + 1, _LANE))
        for _ in range(start.ndim - 1):
            slab = jax.vmap(slab)
        rows = jax.vmap(slab)(xr, hi).astype(sel_dtype)  # [..., rt+1, 128]
    lane = jnp.arange(_LANE)
    shift = lo[..., None, None]
    sel_lo = (lane[:, None] == lane[None, :] + shift).astype(sel_dtype)
    sel_hi = (lane[:, None] == lane[None, :] + shift - _LANE).astype(sel_dtype)
    out = jnp.einsum(
        "...rp,...pu->...ru",
        rows[..., :rt, :],
        sel_lo,
        precision=precision,
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "...rp,...pu->...ru",
        rows[..., 1 : rt + 1, :],
        sel_hi,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    out = out.astype(buffer.dtype)
    return out.reshape(buffer.shape[:-1] + (out_pad,))[..., :size]


def locate_preamble(
    config: ModemConfig, samples: jnp.ndarray, method: str = "auto"
) -> SyncResult:
    """Find the preamble start in a capture.

    Args:
      samples: float [..., N] raw capture (N >= preamble_samples).
    Returns:
      SyncResult with integer offset, parabolic sub-sample refinement, and a
      normalized quality metric (1.0 = perfect match; threshold ~0.5 for
      detection under moderate noise).
    """
    template = preamble_waveform(config)
    corr = correlate_template(samples, template, method=method)
    abs_corr = jnp.abs(corr)
    offset = jnp.argmax(abs_corr, axis=-1).astype(jnp.int32)

    # Parabolic interpolation around the peak for sub-sample timing.
    n_corr = abs_corr.shape[-1]
    center = jnp.take_along_axis(abs_corr, offset[..., None], axis=-1)[..., 0]
    left_i = jnp.clip(offset - 1, 0, n_corr - 1)
    right_i = jnp.clip(offset + 1, 0, n_corr - 1)
    left = jnp.take_along_axis(abs_corr, left_i[..., None], axis=-1)[..., 0]
    right = jnp.take_along_axis(abs_corr, right_i[..., None], axis=-1)[..., 0]
    denom = left - 2.0 * center + right
    frac = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0
    ).astype(jnp.float32)
    frac = jnp.clip(frac, -0.5, 0.5)

    t_energy = jnp.sum(template * template)
    windows_energy = _local_energy(samples, template.shape[-1], offset)
    quality = normalized_match_quality(center, windows_energy, t_energy)
    return SyncResult(offset=offset, frac=frac, quality=quality)


def _local_energy(samples: jnp.ndarray, k: int, offset: jnp.ndarray) -> jnp.ndarray:
    """Energy of the k-sample window at ``offset`` (batched gather)."""
    csum = jnp.cumsum(samples * samples, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    end = jnp.take_along_axis(csum, (offset + k)[..., None], axis=-1)[..., 0]
    start = jnp.take_along_axis(csum, offset[..., None], axis=-1)[..., 0]
    return end - start
