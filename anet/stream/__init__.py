"""Streaming runtime: chunked `lax.scan` demodulation with explicit carry.

This is the TPU-native equivalent of the reference receiver's streaming
pipeline (SURVEY.md §2.4, §5): where the firmware runs a FreeRTOS task that
pulls frames off a socket into a bounded queue and decodes them one at a
time (network.cpp:409-430 -> playback.cpp:80-143), anet processes an
unbounded capture as fixed-size chunks threaded through a scan whose carry
holds everything the demodulator remembers between chunks:

- a sliding sample buffer (the ring-buffer analog, ByteRingBuffer.kt),
- frame-lock bookkeeping (dedupe of re-detections),
- cumulative counters: frames detected / frames ok / decode errors — the
  implemented version of the reference's designed-but-unsent
  ReceiverError feedback (ip.proto:56-61, TODO at playback.cpp:94).

Because carry state is explicit, resume is trivial (checkpoint the carry,
SURVEY.md §5 checkpoint/resume) and per-stream reset is just reinitializing
the carry (playback_start_new_stream analog, playback.cpp:67-74).

Detection model: each scan step appends one chunk to the buffer and
examines the "just completed" window — frame start positions whose frame
end arrived within the new chunk — so every frame is considered exactly
once, at the earliest step where it is fully buffered. The fixed-length
path detects at most one frame per chunk; choose chunk_size <= one frame
length to guarantee no frame is skipped when frames do not overlap. The
dynamic-length path additionally takes ``max_frames_per_chunk`` for
streams whose frames can be much shorter than the max (each extra slot
costs one more fixed demod per chunk).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from anet.dsp.family import geometry as family_geometry
from anet.dsp.frame import FrameResult
from anet.dsp.sync import blockwise_match_quality, correlate_template

__all__ = [
    "DynamicStreamStepOutput",
    "StreamCarry",
    "StreamStepOutput",
    "StreamResult",
    "family_geometry",
    "init_carry",
    "load_carry",
    "save_carry",
    "stream_step",
    "stream_step_dynamic",
    "receive_stream",
    "receive_stream_dynamic",
    "quantize_int8",
    "INT8_STREAM_SCALE",
]


# Candidate threshold for the normalized preamble correlation. Kept low:
# the demodulated-header gate (magic + CRC, 48 bits) rejects false locks,
# so the threshold only needs to beat the noise floor (~0.1-0.25) — and
# coded (FEC) frames remain detectable at SNRs where sync quality drops
# well below 0.5.
DEFAULT_DETECT_THRESHOLD = 0.45


class StreamCarry(NamedTuple):
    """Everything the streaming receiver remembers between chunks."""

    buffer: jnp.ndarray  # float32 [L] sliding sample window
    samples_seen: jnp.ndarray  # int32 — absolute sample count consumed
    last_frame_end: jnp.ndarray  # int32 — absolute end of last accepted frame
    frames_detected: jnp.ndarray  # int32
    frames_ok: jnp.ndarray  # int32
    decode_errors: jnp.ndarray  # int32 — preamble locked but integrity failed
    locked: jnp.ndarray  # bool — frame-lock mode: next frame start predicted
    next_start: jnp.ndarray  # int32 — absolute predicted start of next frame
    drift: jnp.ndarray  # float32 — clock-drift estimate, samples per frame


class StreamStepOutput(NamedTuple):
    """Per-chunk emission (stacked by scan over the chunk axis)."""

    frame: FrameResult
    detected: jnp.ndarray  # bool — a frame completed in this chunk
    quality: jnp.ndarray  # float32 — best sync quality in the window
    frame_start: jnp.ndarray  # int32 — absolute sample index of frame start


class StreamResult(NamedTuple):
    carry: StreamCarry
    steps: StreamStepOutput


def _track_margin(config, track: bool) -> int:
    """Extra tail samples buffered past the nominal frame end when clock
    tracking: a slow RX clock stretches frames past frame_samples, and the
    tracker's probes read a few samples beyond the last symbol. Two symbol
    periods cover ~±2000 ppm over the longest frames plus the probe span.

    Tracking is MFSK-only (stream_step validates); OFDM configs get no
    margin so the geometry stays consistent while the error surfaces.
    """
    if not track:
        return 0
    from anet.dsp.family import is_ofdm

    if is_ofdm(config):
        return 0
    return 2 * config.samples_per_symbol


def _buffer_len(config, chunk_size: int, payload_len: int, track: bool = False) -> int:
    from anet.dsp.family import frame_samples, is_ofdm

    live = frame_samples(config, payload_len) + chunk_size + _track_margin(config, track)
    # zero tail pad sized so the fused align+demod kernel's per-stream
    # span DMAs stay inside the array with no in-step pad copies (see
    # anet.kernels.demod_at_buffer_pad). Applied whenever the MFSK fused
    # geometry could dispatch; harmless zeros otherwise — and buffer
    # geometry stays backend-independent, so checkpoints move freely
    # between CPU and TPU.
    if not is_ofdm(config) and 128 % config.samples_per_symbol == 0:
        from anet.dsp.frame import data_symbols_for_payload
        from anet.kernels import demod_at_buffer_pad

        n_symbols = data_symbols_for_payload(config, payload_len)
        live += demod_at_buffer_pad(config, n_symbols, chunk_size, live)
    return live


def _check_carry_geometry(
    config, carry: StreamCarry, chunk_size: int, payload_len: int, track: bool
) -> None:
    """Reject a carry built for a different chunk/payload/track geometry.

    Accepts either the current padded length (_buffer_len) or the legacy
    unpadded frame + chunk + margin (pre-round-3b checkpoints; the demod
    then pads in-step, slower but identical)."""
    from anet.dsp.family import frame_samples

    length = carry.buffer.shape[-1]
    expected = _buffer_len(config, chunk_size, payload_len, track)
    legacy = (
        frame_samples(config, payload_len)
        + chunk_size
        + _track_margin(config, track)
    )
    # accepted: ANY length in [legacy, expected] — the unpadded legacy
    # geometry, the current padded one, and every pad formula in between
    # (the round-3 pre-merged-kernel pad, or a pad that happened to be 0
    # under the old formula). Everything past `legacy` is zero tail pad
    # by construction: _slide_buffer carries arbitrary pad through
    # untouched, and a pad short of the current budget just means the
    # demod falls back to an in-step pad copy — slower but identical.
    if not (legacy <= length <= expected):
        raise ValueError(
            f"carry buffer {length} != expected {expected} (or legacy"
            f" {legacy}) for frame {frame_samples(config, payload_len)}"
            f" + chunk {chunk_size}; init_carry with the same"
            " chunk_size/payload_len/track"
        )


def init_carry(
    config,
    chunk_size: int,
    payload_len: int,
    batch_shape: Tuple[int, ...] = (),
    track: bool = False,
    dtype=jnp.float32,
) -> StreamCarry:
    """Fresh stream state (the playback_start_new_stream analog).

    ``track`` must match the receive calls (the tracking margin changes the
    buffer geometry). ``dtype`` is the sliding buffer's storage dtype —
    receive_stream defaults it to its compute_dtype, so a bf16 hot path
    also slides/correlates/gathers bf16 (half the HBM traffic; samples
    are quantized once at ingest, exactly where the demod casts anyway).
    ``dtype=jnp.int8`` halves that again: chunks quantize at the append
    edge (fixed scale — INT8_STREAM_SCALE) and the TPU lock hot path
    runs the int8 x int8 -> int32 MXU kernels; decisions and all
    quality/conf/snr ratios are scale-invariant
    (tests/test_stream_int8.py)."""
    length = _buffer_len(config, chunk_size, payload_len, track)
    zi = jnp.zeros(batch_shape, jnp.int32)
    return StreamCarry(
        buffer=jnp.zeros(batch_shape + (length,), dtype),
        samples_seen=zi,
        last_frame_end=zi,
        frames_detected=zi,
        frames_ok=zi,
        decode_errors=zi,
        locked=jnp.zeros(batch_shape, jnp.bool_),
        next_start=zi,
        drift=jnp.zeros(batch_shape, jnp.float32),
    )


# Frame-lock clock-drift servo limits: a per-frame start offset of up to
# DRIFT_MAX_OBS samples relative to the previous frame's nominal end is
# treated as TX/RX sample-clock drift and folded into the carry's
# per-stream drift estimate (an EMA with gain DRIFT_EMA); larger gaps are
# real TX pauses and never bias the estimate. 64 samples/frame is
# ~1760 ppm at the bench frame length — comfortably past real crystal
# skew (the reference absorbs the same skew with its adaptive queue
# timeout, playback.cpp:90,125-130); the ±2-sample probe servo then only
# has to cover the RESIDUAL prediction error, not the raw drift.
DRIFT_MAX_OBS = 64
DRIFT_EMA = 0.5

# Dedupe-cursor slack: the cursor rejects candidates overlapping the last
# accepted frame to suppress double-detections of the SAME frame — but a
# fast RX clock COMPRESSES frames, so a genuine back-to-back successor
# starts up to drift-per-frame samples before the previous frame's
# NOMINAL end (at +500 ppm every other frame was rejected this way). A
# true duplicate overlaps by ~a whole frame, so a DRIFT_MAX_OBS-sample
# slack keeps the dedupe property while admitting compressed successors.
DEDUPE_SLACK = DRIFT_MAX_OBS


def _drift_round(drift: jnp.ndarray) -> jnp.ndarray:
    """The integer prediction offset implied by the drift estimate."""
    return jnp.round(drift).astype(jnp.int32)


def _drift_update(
    carry: StreamCarry, detected: jnp.ndarray, start_abs: jnp.ndarray
) -> jnp.ndarray:
    """Fold this frame's observed start offset into the drift estimate.

    ``start_abs - last_frame_end`` is the cumulative clock slip since the
    previous frame's nominal end — exactly the per-frame drift for
    back-to-back frames. Only detections continuing an existing chain
    (last_frame_end > 0) within DRIFT_MAX_OBS update the estimate; a real
    TX gap leaves it untouched."""
    obs = (start_abs - carry.last_frame_end).astype(jnp.float32)
    valid = (
        detected
        & (carry.last_frame_end > 0)
        & (jnp.abs(obs) <= DRIFT_MAX_OBS)
    )
    return jnp.where(
        valid, carry.drift + DRIFT_EMA * (obs - carry.drift), carry.drift
    )


def stream_step(
    config,
    carry: StreamCarry,
    chunk: jnp.ndarray,
    payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    compute_dtype=jnp.float32,
    track: bool = False,
    lock: bool = False,
) -> Tuple[StreamCarry, StreamStepOutput]:
    """Consume one chunk; maybe emit one frame.

    ``chunk``: float [..., chunk_size]; batch axes must match the carry's.
    ``track=True`` demodulates each candidate frame with the symbol-clock
    tracker (MFSK only — sequential over symbols, so slower, but frames
    survive TX/RX sample-rate drift within a long capture).
    ``lock=True`` enables frame-lock mode (_find_candidate_locked): locked
    streams verify a predicted start with a cheap probe and the full
    search runs only when some stream needs acquiring — the steady-state
    fast path. Decoded frames are identical to the always-search mode;
    per-chunk ``quality`` comes from the probe while locked and
    ``frame_start`` can differ by the ±2-sample drift servo.
    """
    chunk_size = chunk.shape[-1]
    t_frame, template, demod = family_geometry(config, payload_len, compute_dtype)
    if lock and track:
        raise ValueError("lock=True does not compose with track=True (the "
                         "clock tracker already re-times each frame)")
    _check_carry_geometry(config, carry, chunk_size, payload_len, track)
    if lock and _merged_lock_supported(config, carry, chunk_size):
        return _locked_step_merged(
            config, carry, chunk, payload_len, detect_threshold, compute_dtype,
            t_frame, template,
        )
    margin = _track_margin(config, track)
    mid_flight = None
    if lock:
        (
            buffer,
            samples_seen,
            start_idx,
            start_abs,
            best_q,
            candidate,
            mid_flight,
        ) = _find_candidate_locked(
            carry, chunk, t_frame, template, detect_threshold, compute_dtype
        )
    else:
        buffer, samples_seen, start_idx, start_abs, best_q, candidate = _find_candidate(
            carry, chunk, t_frame, template, margin, detect_threshold, compute_dtype
        )

    # Fixed-cost demod at the candidate position. A lock counts as a real
    # detection only if the demodulated header validates (magic word +
    # header CRC, 48 bits of check) — correlation sidelobes from partial
    # frame overlap can clear the quality threshold, but they essentially
    # never produce a valid header. This mirrors the reference's layering:
    # framing-level garbage resets silently (network.cpp:432-434); only
    # in-frame payload corruption counts as a decode error.
    if track:
        from anet.dsp.clock import tracked_frame_result
        from anet.dsp.family import is_ofdm

        if is_ofdm(config):
            raise ValueError(
                "track=True is the MFSK time-domain tracker; OFDM clock "
                "drift is handled per-frame by OfdmConfig.clock_tracking "
                "(default on)"
            )
        # include the margin tail: slow-clock frames stretch past t_frame
        aligned = _batched_dynamic_slice(
            buffer, start_idx, t_frame + margin, compute_dtype
        )
        frame, _ = tracked_frame_result(
            config,
            aligned,
            payload_len,
            float(config.preamble_samples),
            compute_dtype=compute_dtype,
        )
    else:
        from anet.dsp.family import is_ofdm

        fused = (
            jax.default_backend() == "tpu"
            and not is_ofdm(config)
            and 128 % config.samples_per_symbol == 0
            and buffer.dtype in (jnp.bfloat16, jnp.int8)
        )
        if fused and config.fec == "conv":
            # Fused CODED path: same DMA-span alignment fold, but through
            # the energies twin (anet.kernels.demod_at_energies_fused) —
            # soft FEC LLRs (anet.dsp.demod.bit_llrs) need every tone's
            # energy, not just the winner. Energies -> LLRs -> the Viterbi
            # kernel is exactly the aligned coded receiver; only the
            # gather disappears. Robust-mode streams previously paid the
            # slow gather+demod pair here — the one production path that
            # missed the round-3 fusion.
            from anet.dsp.demod import decide_symbols
            from anet.dsp.frame import (
                data_symbols_for_payload,
                frame_result_from_decisions,
            )
            from anet.kernels import demod_at_energies_fused

            energies = demod_at_energies_fused(
                config,
                buffer,
                start_idx,
                data_symbols_for_payload(config, payload_len),
                start_bound=chunk_size,
            )
            frame = frame_result_from_decisions(
                config, decide_symbols(config, energies), energies, payload_len
            )
        elif fused:
            # Fused align+demod (anet.kernels.demod_at_fused): the aligned
            # frame tensor never exists in HBM — the timing gather is folded
            # into the filterbank contraction, so the only frame-sized HBM
            # traffic in the whole step is the one buffer read the sync
            # search already does. Uncoded MFSK with a bf16 buffer only
            # (exactly the streaming hot path); everything else keeps the
            # gather + demod golden pair below.
            from anet.dsp.frame import (
                data_symbols_for_payload,
                frame_result_from_tone_decisions,
            )
            from anet.kernels import demod_at_fused

            tone, best, total = demod_at_fused(
                config,
                buffer,
                start_idx,
                data_symbols_for_payload(config, payload_len),
                # max candidate start = w0 + chunk - 1 = chunk_size; the
                # carry buffer is pre-padded for exactly this bound
                # (_buffer_len), so the kernel's pad copy is a no-op
                start_bound=chunk_size,
            )
            frame = frame_result_from_tone_decisions(
                config, tone, best, total, payload_len
            )
        else:
            aligned = _batched_dynamic_slice(buffer, start_idx, t_frame, compute_dtype)
            frame = demod(aligned)
    detected = candidate & frame.magic_ok & frame.header_crc_ok
    frame = frame._replace(ok=frame.ok & detected)

    if lock:
        # a detection (re)locks the stream; a mid-flight prediction keeps
        # its lock; everything else (probe failed, expired, searched and
        # missed) re-acquires by full search next chunk. Detections that
        # continue a frame chain also update the drift estimate, so the
        # next prediction absorbs clock skew beyond the ±2-sample servo.
        locked_new = detected | mid_flight
        drift_new = _drift_update(carry, detected, start_abs)
        # next_start is the PREDICTED absolute start of the next frame:
        # nominal end plus the (updated) drift estimate, so stored
        # predictions — including warm seeds and checkpoints — are used
        # verbatim at probe time.
        next_start_new = jnp.where(
            detected, start_abs + t_frame + _drift_round(drift_new),
            carry.next_start,
        )
    else:
        locked_new = carry.locked
        next_start_new = carry.next_start
        drift_new = carry.drift
    new_carry = StreamCarry(
        buffer=buffer,
        samples_seen=samples_seen,
        last_frame_end=jnp.where(detected, start_abs + t_frame, carry.last_frame_end),
        frames_detected=carry.frames_detected + detected.astype(jnp.int32),
        frames_ok=carry.frames_ok + frame.ok.astype(jnp.int32),
        decode_errors=carry.decode_errors
        + (detected & ~frame.ok).astype(jnp.int32),
        locked=locked_new,
        next_start=next_start_new,
        drift=drift_new,
    )
    out = StreamStepOutput(
        frame=frame, detected=detected, quality=best_q, frame_start=start_abs
    )
    return new_carry, out


class StreamCheckpoint(NamedTuple):
    """A saved receiver state: the scan carry plus any capture tail that
    was not yet a whole chunk (so no padding zeros are ever spliced into
    the middle of a resumed stream)."""

    carry: StreamCarry
    pending: "jnp.ndarray"  # float32 [..., r], r < chunk_size unconsumed samples


def save_carry(path, carry: StreamCarry, pending=None) -> None:
    """Checkpoint stream state to an .npz file (SURVEY.md §5
    checkpoint/resume). The carry is the receiver's entire memory, so a
    restored run continues bit-exactly where the saved one stopped.
    ``pending`` holds trailing samples short of a whole chunk; prepend them
    to the next capture on resume."""
    import numpy as np

    fields = {k: np.asarray(v) for k, v in carry._asdict().items()}
    # npz has no bfloat16; store the buffer widened to f32 (lossless) and
    # remember the dtype so load_carry restores it bit-exactly.
    fields["buffer_dtype"] = np.asarray(str(carry.buffer.dtype))
    fields["buffer"] = np.asarray(carry.buffer.astype(jnp.float32))
    fields["pending"] = (
        np.zeros(0, np.float32) if pending is None else np.asarray(pending, np.float32)
    )
    np.savez_compressed(path, **fields)


def load_carry(path) -> StreamCheckpoint:
    """Restore a checkpoint written by save_carry. Geometry (buffer length >=
    frame + chunk + margin, any excess being the demod tail pad) is
    validated by the next stream step; pre-pad checkpoints stay loadable
    (the demod then pads in-step instead)."""
    import numpy as np

    with np.load(path) as z:
        # lock fields default (pre-lock checkpoints resume unlocked — the
        # next chunk re-acquires by full search, bit-identical behavior)
        optional = {"locked", "next_start", "drift"}
        missing = [
            f for f in StreamCarry._fields if f not in z and f not in optional
        ]
        if missing:
            raise ValueError(f"{path} is not a stream checkpoint (missing {missing})")
        fields = {f: jnp.asarray(z[f]) for f in StreamCarry._fields if f in z}
        ref = fields["samples_seen"]
        fields.setdefault("locked", jnp.zeros(ref.shape, jnp.bool_))
        fields.setdefault("next_start", jnp.zeros_like(ref))
        fields.setdefault("drift", jnp.zeros(ref.shape, jnp.float32))
        carry = StreamCarry(**fields)
        if "buffer_dtype" in z:
            carry = carry._replace(
                buffer=carry.buffer.astype(str(z["buffer_dtype"]))
            )
        pending = jnp.asarray(z["pending"]) if "pending" in z else jnp.zeros(0)
        return StreamCheckpoint(carry=carry, pending=pending)


def _slide_buffer(carry: StreamCarry, chunk: jnp.ndarray, t_frame: int, margin: int):
    """Slide the carry buffer one chunk. Returns (buffer, samples_seen,
    w0, buffer_abs0) where [w0, w0 + chunk_size) are the just-completed
    frame starts — positions whose nominal frame END lies in the newest
    fully-margined chunk: start in (L - T - chunk - margin, L - T -
    margin] — exactly chunk_size wide. With margin > 0 (tracking)
    detection waits until `margin` samples of tail context exist, so
    drift-stretched frames stay inside the buffer.

    Any buffer length beyond frame + chunk + margin is a ZERO TAIL PAD
    (init_carry sizes it so demod_at_fused's per-stream span DMAs never
    leave the array — see anet.kernels.demod_at_buffer_pad); the live
    window slides ahead of it and the pad is carried through untouched.
    Old (unpadded) checkpoints remain valid: the demod falls back to an
    in-step pad copy, slower but identical."""
    chunk_size = chunk.shape[-1]
    length = carry.buffer.shape[-1]
    live = t_frame + chunk_size + margin
    if length < live:
        raise ValueError(
            f"carry buffer {length} < frame {t_frame} + chunk {chunk_size}"
            f" + margin {margin}; init_carry with the same"
            " chunk_size/payload_len/track"
        )
    # int8 sliding buffers: each incoming float chunk quantizes ONCE at
    # this append edge with the FIXED scale (a per-chunk max scale would
    # mix units across the chunk boundaries a frame span straddles);
    # already-int8 chunks (a capture quantized at the ingest edge) pass
    # through untouched. Every downstream quality/decision is a ratio in
    # buffer units, so the scale cancels — see INT8_STREAM_SCALE.
    qchunk = _ingest_cast(chunk, carry.buffer.dtype)
    buffer = jnp.concatenate(
        [
            carry.buffer[..., chunk_size:live],
            qchunk,
            carry.buffer[..., live:],
        ],
        axis=-1,
    )
    samples_seen = carry.samples_seen + chunk_size
    # Absolute index of buffer[0] (relative to the LIVE sample stream):
    buffer_abs0 = samples_seen - live
    w0 = 1  # = live - t_frame - chunk_size - margin + 1
    return buffer, samples_seen, w0, buffer_abs0


def _search_best(
    carry: StreamCarry,
    chunk: jnp.ndarray,
    t_frame: int,
    template: jnp.ndarray,
    margin: int,
    compute_dtype=jnp.float32,
):
    """Slide + preamble search, returning only the per-stream best:
    (buffer, samples_seen, w0, buffer_abs0, best_q, best_rel).

    On TPU this is one fused Pallas kernel (anet.kernels.sync_search_fused):
    correlation, blockwise quality, and the running max/argmax all happen
    in VMEM, so the [..., chunk_size] correlation and quality arrays never
    exist in HBM (writing + re-reading them was ~2/3 of the round-2 stream
    step — docs/PERF.md). CPU keeps the jnp golden path.
    """
    chunk_size = chunk.shape[-1]
    k = template.shape[-1]
    buffer, samples_seen, w0, buffer_abs0 = _slide_buffer(carry, chunk, t_frame, margin)
    seg = jax.lax.dynamic_slice_in_dim(buffer, w0, chunk_size + k - 1, axis=-1)
    seg_c = seg.astype(compute_dtype)
    t_energy = jnp.sum(template * template)
    if jax.default_backend() == "tpu" and chunk_size % 128 == 0:
        best_q, best_rel = _tpu_search(
            seg_c, chunk_size, template.astype(compute_dtype), t_energy
        )
    else:
        corr = correlate_template(seg_c, template.astype(compute_dtype), method="matmul")
        quality = blockwise_match_quality(seg_c, corr, k, t_energy)
        best_rel = jnp.argmax(quality, axis=-1).astype(jnp.int32)
        best_q = jnp.max(quality, axis=-1)
    return buffer, samples_seen, w0, buffer_abs0, best_q, best_rel


def _tpu_search(seg_c, chunk_size, t_c, t_energy):
    """The TPU acquisition search: the fused correlate+quality+argmax
    kernel. A round-4 two-phase variant (sync_search_blockmax + a 128-lag
    probe refine) tested the round-3 hypothesis that the fused max/argmax
    epilogue serialized against the band matmuls — measured NULL: the
    block-maxima kernel costs the same 30.7 vs 30.9 ms/step in-scan at
    chunk 36352, B=8192 (tools/exp_search2.py), and its probe refine adds
    11 ms on top. The search cost is the band matmuls themselves (the 5x
    input re-read + M=128 MXU fill/drain — docs/PERF.md), so the single
    fused kernel stays. Returns (best_q, best_rel)."""
    from anet.kernels import sync_search_fused

    bq, br = sync_search_fused(seg_c, t_c, chunk_size, t_energy)
    return bq, br.astype(jnp.int32)


def _slide_and_quality(
    carry: StreamCarry,
    chunk: jnp.ndarray,
    t_frame: int,
    template: jnp.ndarray,
    margin: int,
    compute_dtype=jnp.float32,
):
    """Slide the buffer one chunk and score every just-completed frame
    start: positions whose nominal frame END arrived within the new chunk.

    Returns (buffer, samples_seen, w0, buffer_abs0, quality) where quality
    is [..., chunk_size] — the normalized preamble match at starts
    [w0, w0 + chunk_size) of the buffer. This materializing form exists
    for the multi-candidate dynamic path, which iteratively masks the
    quality array; single-candidate callers use _search_best.
    """
    chunk_size = chunk.shape[-1]
    k = template.shape[-1]
    buffer, samples_seen, w0, buffer_abs0 = _slide_buffer(
        carry, chunk, t_frame, margin
    )
    # Correlate template against starts [w0, w0 + chunk_size).
    seg = jax.lax.dynamic_slice_in_dim(buffer, w0, chunk_size + k - 1, axis=-1)
    # Block-Toeplitz matmul correlation: the MXU formulation, and the only
    # backend-portable one (irfft is unimplemented on the remote TPU
    # plugin — CLAUDE.md). One code path for CPU tests and chip runs.
    # Correlation and window energy both run in compute_dtype (bf16 on
    # the chip: 4x MXU rate; the 0.45 detection threshold has >50x that
    # margin) with f32 accumulation; quality math is f32.
    seg_c = seg.astype(compute_dtype)
    if jax.default_backend() == "tpu":
        # Fused Pallas correlator: the overlapped window tensor the jnp
        # block-Toeplitz form materializes in HBM (2.7 GB/step at the
        # bench size) exists only in VMEM — measured 23.7 vs 33.3 ms.
        from anet.kernels import correlate_fused

        corr = correlate_fused(seg_c, template.astype(compute_dtype), chunk_size)
    else:
        corr = correlate_template(
            seg_c, template.astype(compute_dtype), method="matmul"
        )  # [..., chunk_size], f32 accumulation
    t_energy = jnp.sum(template * template)
    # Window-energy normalization at 128-lag granularity: the exact
    # per-lag prefix sum measured 18 ms/step at the bench size for a <=3%
    # quality difference that the 0.45-vs-~1.0 threshold margin swallows
    # (see sync.blockwise_match_quality).
    quality = blockwise_match_quality(seg_c, corr, k, t_energy)
    return buffer, samples_seen, w0, buffer_abs0, quality


def _find_candidate(
    carry: StreamCarry,
    chunk: jnp.ndarray,
    t_frame: int,
    template: jnp.ndarray,
    margin: int,
    detect_threshold: float,
    compute_dtype=jnp.float32,
):
    """Shared front half of the stream steps: slide the buffer, correlate
    the preamble template over the just-completed window, and nominate at
    most one candidate frame start per chunk.

    Returns (buffer, samples_seen, start_idx, start_abs, best_q, candidate).
    """
    buffer, samples_seen, w0, buffer_abs0, best_q, best_rel = _search_best(
        carry, chunk, t_frame, template, margin, compute_dtype
    )
    start_idx = w0 + best_rel  # buffer index of candidate frame start
    start_abs = buffer_abs0 + start_idx

    # Candidate if quality clears the threshold and the frame does not overlap
    # the previously accepted frame (dedupe against double-detection).
    no_overlap = start_abs >= carry.last_frame_end - DEDUPE_SLACK
    candidate = (best_q >= detect_threshold) & no_overlap
    return buffer, samples_seen, start_idx, start_abs, best_q, candidate


PROBE_LAGS = 5  # frame-lock probe lags: ±2 samples of clock-drift servo

# int8 sliding-buffer quantization: round(x * SCALE) clipped to ±127,
# applied ONCE per chunk at the _slide_buffer append edge. The scale is
# FIXED (not per-chunk max) because a demod span straddles chunk
# boundaries — mixed units would corrupt energies across the seam. 32
# covers ±3.97 of waveform amplitude: the TX emits ±1-scale tones, so
# even at 0 dB waveform SNR (noise std ~= signal rms) samples past 4.0
# are > 5 sigma — clipping is negligible, and the 1/64-LSB quantization
# noise sits ~36 dB under a unit tone, far below every preset's
# operating channel noise. All probe/search qualities and demod
# conf/snr are RATIOS in buffer units, so the scale cancels end to end
# (tests/test_stream_int8.py pins both the cancellation and the BER).
INT8_STREAM_SCALE = 32.0


def _ingest_cast(samples: jnp.ndarray, buffer_dtype) -> jnp.ndarray:
    """Cast ingest samples to the sliding-buffer dtype: quantize for
    int8 buffers (plain astype truncates sub-unit waveforms to zero),
    plain astype otherwise; already-int8 input passes through."""
    if buffer_dtype == jnp.int8 and samples.dtype != jnp.int8:
        return quantize_int8(samples)
    return samples.astype(buffer_dtype)


def quantize_int8(samples: jnp.ndarray) -> jnp.ndarray:
    """Quantize float waveform samples to the int8 stream-buffer format:
    round(x * INT8_STREAM_SCALE) clipped to ±127. Apply ONCE at the
    ingest edge (captures) — _slide_buffer applies it automatically to
    float chunks entering an int8 carry and passes int8 chunks through."""
    return jnp.clip(
        jnp.round(samples.astype(jnp.float32) * INT8_STREAM_SCALE),
        -127.0,
        127.0,
    ).astype(jnp.int8)


def _merged_lock_supported(config, carry, chunk_size: int) -> bool:
    """The merged probe+demod kernel (anet.kernels.demod_probe_fused)
    applies on the uncoded MFSK bf16 lock hot path: TPU backend, fused
    demod geometry, preamble a whole number of 128-lane rows, and a
    lane-aligned chunk (the acquisition search kernel's contract)."""
    from anet.dsp.family import is_ofdm

    return (
        jax.default_backend() == "tpu"
        and not is_ofdm(config)
        and getattr(config, "fec", "none") == "none"
        and 128 % config.samples_per_symbol == 0
        and (config.preamble_symbols * config.samples_per_symbol) % 128 == 0
        and carry.buffer.dtype in (jnp.bfloat16, jnp.int8)
        and chunk_size % 128 == 0
    )


def _locked_step_merged(
    config,
    carry: StreamCarry,
    chunk: jnp.ndarray,
    payload_len: int,
    detect_threshold: float,
    compute_dtype,
    t_frame: int,
    template: jnp.ndarray,
) -> Tuple[StreamCarry, StreamStepOutput]:
    """The locked stream step through ONE kernel: the merged probe +
    align+demod (anet.kernels.demod_probe_fused) replaces the separate
    probe and demod kernels, whose independent span DMAs and per-stream
    lane-alignment one-hot passes each cost ~13 ms/step at the bench
    geometry (round-4 lock bisection, tools/exp_stream2.py). Acquisition
    still runs the full search under ``lax.cond`` — plus one demod at
    the searched starts — exactly when some stream needs it; decoded
    frames are identical to the unmerged lock path (CPU interpret
    equality: tests/test_stream_lock.py)."""
    from anet.dsp.frame import (
        data_symbols_for_payload,
        frame_result_from_tone_decisions,
    )
    from anet.kernels import demod_at_fused, demod_probe_fused

    chunk_size = chunk.shape[-1]
    k = template.shape[-1]
    t_c = template.astype(compute_dtype)
    t_energy = jnp.sum(t_c.astype(jnp.float32) ** 2)
    n_symbols = data_symbols_for_payload(config, payload_len)
    buffer, samples_seen, w0, buffer_abs0 = _slide_buffer(carry, chunk, t_frame, 0)
    length = t_frame + chunk_size

    pred_idx = carry.next_start - buffer_abs0  # stored drift-adjusted
    in_win = carry.locked & (pred_idx >= w0) & (pred_idx < w0 + chunk_size)
    mid_flight = carry.locked & (pred_idx >= w0 + chunk_size)

    probe_at = jnp.clip(pred_idx, 0, length - t_frame)
    st0 = jnp.clip(
        probe_at - PROBE_LAGS // 2,
        0,
        buffer.shape[-1] - k - PROBE_LAGS + 1,
    )
    cmax, probe_off, energy, tone_p, best_p, total_p = demod_probe_fused(
        config, buffer, st0, n_symbols, t_c,
        n_lags=PROBE_LAGS, start_bound=length - t_frame,
    )
    floored = jnp.maximum(energy, 1e-4 * t_energy)
    probe_q = cmax * jax.lax.rsqrt(t_energy * floored)
    refined_idx = st0 + probe_off
    pred_valid = in_win & (probe_q >= detect_threshold)

    need_search = jnp.any(~(pred_valid | mid_flight))

    def do_search(buf):
        seg = jax.lax.dynamic_slice_in_dim(buf, w0, chunk_size + k - 1, axis=-1)
        bq, br = _tpu_search(seg.astype(compute_dtype), chunk_size, t_c, t_energy)
        sel_idx = jnp.where(pred_valid, refined_idx, w0 + br)
        tone_s, best_s, total_s = demod_at_fused(
            config, buf, sel_idx, n_symbols, start_bound=chunk_size
        )
        return bq, br, tone_s, best_s, total_s

    def skip_search(buf):
        shape = carry.samples_seen.shape
        zf = jnp.zeros(shape, jnp.float32)
        zi = jnp.zeros(shape, jnp.int32)
        zs = jnp.zeros(shape + (n_symbols,), jnp.float32)
        return zf, zi, jnp.zeros(shape + (n_symbols,), jnp.int32), zs, zs

    bq, br, tone_s, best_s, total_s = jax.lax.cond(
        need_search, do_search, skip_search, buffer
    )
    start_idx = jnp.where(pred_valid, refined_idx, w0 + br)
    start_abs = buffer_abs0 + start_idx
    quality = jnp.where(pred_valid, probe_q, bq)
    searched_ok = (bq >= detect_threshold) & (
        (buffer_abs0 + w0 + br) >= carry.last_frame_end - DEDUPE_SLACK
    )
    candidate = pred_valid | (~mid_flight & searched_ok)

    pv_s = pred_valid[..., None]
    frame = frame_result_from_tone_decisions(
        config,
        jnp.where(pv_s, tone_p, tone_s),
        jnp.where(pv_s, best_p, best_s),
        jnp.where(pv_s, total_p, total_s),
        payload_len,
    )
    detected = candidate & frame.magic_ok & frame.header_crc_ok
    frame = frame._replace(ok=frame.ok & detected)
    locked_new = detected | mid_flight
    drift_new = _drift_update(carry, detected, start_abs)
    next_start_new = jnp.where(
        detected, start_abs + t_frame + _drift_round(drift_new),
        carry.next_start,
    )
    new_carry = StreamCarry(
        buffer=buffer,
        samples_seen=samples_seen,
        last_frame_end=jnp.where(detected, start_abs + t_frame, carry.last_frame_end),
        frames_detected=carry.frames_detected + detected.astype(jnp.int32),
        frames_ok=carry.frames_ok + frame.ok.astype(jnp.int32),
        decode_errors=carry.decode_errors
        + (detected & ~frame.ok).astype(jnp.int32),
        locked=locked_new,
        next_start=next_start_new,
        drift=drift_new,
    )
    out = StreamStepOutput(
        frame=frame, detected=detected, quality=quality, frame_start=start_abs
    )
    return new_carry, out


def _find_candidate_locked(
    carry: StreamCarry,
    chunk: jnp.ndarray,
    t_frame: int,
    template: jnp.ndarray,
    detect_threshold: float,
    compute_dtype=jnp.float32,
):
    """Frame-lock front half: probe the PREDICTED next frame start, and run
    the full-window search only when some stream actually needs acquiring.

    The reference receiver never re-synchronizes a connected stream — its
    TCP reader trusts the length-delimited framing from connect onward
    (network.cpp:409-430). This is the modem-level analog: once a frame
    decodes, the next one is expected exactly one frame later, so the
    steady-state chunk replaces the every-lag search (the step's single
    largest cost) with an O(n_lags) probe (sync.preamble_quality_probe)
    that both verifies the prediction and servos out ±2 samples of clock
    drift per frame. The search still runs — under ``lax.cond``, paid only
    when needed — whenever a stream is unlocked, its prediction expired,
    or its probe failed (TX gap), so acquisition and re-acquisition behave
    exactly like the always-search path.

    Returns (buffer, samples_seen, start_idx, start_abs, quality,
    candidate, mid_flight); ``start_idx`` is already drift-refined for
    predicted candidates, and ``mid_flight`` marks streams that keep
    their lock without a candidate this chunk.
    """
    from anet.dsp.sync import preamble_quality_probe

    chunk_size = chunk.shape[-1]
    k = template.shape[-1]
    buffer, samples_seen, w0, buffer_abs0 = _slide_buffer(carry, chunk, t_frame, 0)
    # clip probe/refine positions to the LIVE window (the physical buffer
    # may carry a zero tail pad for the demod kernel's span DMAs)
    length = t_frame + chunk_size
    t_c = template.astype(compute_dtype)
    t_energy = jnp.sum(t_c.astype(jnp.float32) ** 2)

    pred_idx = carry.next_start - buffer_abs0  # stored drift-adjusted
    in_win = carry.locked & (pred_idx >= w0) & (pred_idx < w0 + chunk_size)
    # a locked stream whose prediction lies BEYOND this window cannot have
    # any frame complete this chunk: such a frame would overlap the last
    # accepted one and the dedupe cursor rejects it regardless
    mid_flight = carry.locked & (pred_idx >= w0 + chunk_size)

    probe_at = jnp.clip(pred_idx, 0, length - t_frame)
    k_t = template.shape[-1]
    if jax.default_backend() == "tpu" and buffer.dtype == jnp.bfloat16:
        # Span-DMA probe kernel (anet.kernels.probe_at_fused): each
        # stream reads only its own ~k/128 rows. The jnp probe's two
        # bounded one-hot gather passes measured 14.7 ms/step at the
        # bench geometry — HALF the whole locked step (round-4
        # bisection, tools/exp_stream2.py); the kernel replaces them
        # with per-stream DMAs on the proven _demod_at_front machinery.
        from anet.kernels import probe_at_fused

        st0 = jnp.clip(
            probe_at - PROBE_LAGS // 2,
            0,
            buffer.shape[-1] - k_t - PROBE_LAGS + 1,
        )
        q5 = probe_at_fused(
            buffer, st0, t_c, t_energy, n_lags=PROBE_LAGS,
            start_bound=length - t_frame,
        )
    else:
        # start_bound = chunk_size (the clip above): the probe then reads
        # only the ~bound//128 + preamble rows it can touch instead of the
        # whole padded buffer twice (16 -> ~2 ms/step at bench geometry)
        q5, st0 = preamble_quality_probe(
            buffer, probe_at, t_c, t_energy, n_lags=PROBE_LAGS,
            compute_dtype=compute_dtype, start_bound=length - t_frame,
        )
    probe_q = jnp.max(q5, axis=-1)
    probe_off = jnp.argmax(q5, axis=-1).astype(jnp.int32)
    pred_valid = in_win & (probe_q >= detect_threshold)

    need_search = jnp.any(~(pred_valid | mid_flight))

    def do_search(buf):
        seg = jax.lax.dynamic_slice_in_dim(buf, w0, chunk_size + k - 1, axis=-1)
        seg_c = seg.astype(compute_dtype)
        if jax.default_backend() == "tpu" and chunk_size % 128 == 0:
            return _tpu_search(seg_c, chunk_size, t_c, t_energy)
        corr = correlate_template(seg_c, t_c, method="matmul")
        quality = blockwise_match_quality(seg_c, corr, k, t_energy)
        return jnp.max(quality, axis=-1), jnp.argmax(quality, axis=-1).astype(
            jnp.int32
        )

    def skip_search(buf):
        z = jnp.zeros(carry.samples_seen.shape, jnp.float32)
        return z, jnp.zeros(carry.samples_seen.shape, jnp.int32)

    best_q, best_rel = jax.lax.cond(need_search, do_search, skip_search, buffer)

    # candidate per stream: drift-refined prediction when the probe holds,
    # the searched argmax otherwise (mid-flight streams fail the dedupe
    # gate by construction — see above)
    refined_idx = st0 + probe_off
    start_idx = jnp.where(pred_valid, refined_idx, w0 + best_rel)
    start_abs = buffer_abs0 + start_idx
    quality = jnp.where(pred_valid, probe_q, best_q)
    searched_ok = (best_q >= detect_threshold) & (
        (buffer_abs0 + w0 + best_rel) >= carry.last_frame_end - DEDUPE_SLACK
    )
    candidate = pred_valid | (~mid_flight & searched_ok)
    return buffer, samples_seen, start_idx, start_abs, quality, candidate, mid_flight


def _batched_dynamic_slice(
    buffer: jnp.ndarray, start: jnp.ndarray, size: int, compute_dtype=None
) -> jnp.ndarray:
    """dynamic_slice along the last axis with batched start indices."""
    from anet.dsp.sync import aligned_gather

    return aligned_gather(buffer, start, size, compute_dtype)


class DynamicStreamStepOutput(NamedTuple):
    """Per-chunk emission of the variable-length stream receiver."""

    frame: "jnp.ndarray"  # DynamicFrameResult (anet.dsp.frame)
    detected: jnp.ndarray  # bool — a frame completed in this chunk
    quality: jnp.ndarray  # float32 — best sync quality in the window
    frame_start: jnp.ndarray  # int32 — absolute sample index of frame start


def stream_step_dynamic(
    config,
    carry: StreamCarry,
    chunk: jnp.ndarray,
    max_payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    compute_dtype=jnp.float32,
    max_frames_per_chunk: int = 1,
    lock: bool = False,
) -> Tuple[StreamCarry, DynamicStreamStepOutput]:
    """stream_step with the payload length read from each frame's header.

    Geometry (buffer size, detection latency) is sized for
    ``max_payload_len``; short frames decode as soon as a max-length window
    past their start is buffered. The dedupe cursor advances by each
    frame's actual length, so back-to-back short frames separated by at
    least one chunk both decode. init_carry with payload_len =
    max_payload_len. Coded configs (fec='conv') are supported with
    fec_interleave == 1 (e.g. the mfsk4-coded-stream preset): the header
    probe + masked-trellis Viterbi reads each frame's length without FEC
    state (frame.frame_result_from_llrs_dynamic); a depth-d block
    interleaver's length-dependent geometry is the one exclusion.

    ``max_frames_per_chunk``: how many non-overlapping candidates to
    extract per chunk. The default 1 costs one demod per chunk but can
    drop one of two SHORT frames whose (max-length) detection windows
    complete within the same chunk; set 2 (or more) when frames can be
    much shorter than ``max_payload_len`` relative to the chunk size —
    each extra slot adds one fixed-cost demod per chunk. Candidates are
    extracted best-quality-first and masked against each accepted frame's
    actual extent, so the per-step emissions are in quality order, not
    time order (sort by ``frame_start`` downstream if order matters).
    With K > 1 every field of the step output gains a leading axis of
    size K.

    A frame whose header declares a length above ``max_payload_len`` is
    skipped silently (its header gate fails ``length_ok``); later frames
    in the stream are unaffected.

    ``lock=True`` (single-candidate only) is frame-lock mode for dynamic
    frames: the CRC-protected header declares each frame's length, so the
    next start is exactly ``start + dynamic_frame_samples(length)`` — the
    same trust-the-framing argument as the reference's varint length
    prefix (network.cpp:409-430, lock mode's own anchor). Locked streams
    verify the prediction with the cheap probe (±2-sample servo); the
    full search runs under ``lax.cond`` only when some stream needs
    acquiring, exactly as in the fixed-length lock mode.
    """
    from anet.dsp.family import aligned_demod_dynamic_fn, frame_samples
    from anet.dsp.frame import dynamic_frame_samples

    t_max = frame_samples(config, max_payload_len)
    template = family_geometry(config, max_payload_len, compute_dtype)[1]
    _check_carry_geometry(config, carry, chunk.shape[-1], max_payload_len, False)
    mid_flight = None
    if lock:
        if max_frames_per_chunk != 1:
            raise ValueError(
                "lock=True needs max_frames_per_chunk=1 (a locked stream "
                "predicts exactly one next frame; use chunk_size <= the "
                "minimum frame length so at most one frame completes per "
                "chunk)"
            )
        # Same locked front half as the fixed-length path: the window
        # geometry only depends on the MAX frame length; the prediction
        # itself came from the previous frame's declared length.
        (
            buffer,
            samples_seen,
            best1_idx,
            _start_abs,
            best1_q,
            candidate1,
            mid_flight,
        ) = _find_candidate_locked(
            carry, chunk, t_max, template, detect_threshold, compute_dtype
        )
        w0 = 1
        buffer_abs0 = samples_seen - (t_max + chunk.shape[-1])
        best1_rel = best1_idx - w0
        quality = None
    elif max_frames_per_chunk == 1:
        # Single-candidate: the fused sync search (no [..., chunk_size]
        # quality array is ever materialized — see _search_best).
        buffer, samples_seen, w0, buffer_abs0, best1_q, best1_rel = _search_best(
            carry, chunk, t_max, template, 0, compute_dtype
        )
        candidate1 = None
        quality = None
    else:
        buffer, samples_seen, w0, buffer_abs0, quality = _slide_and_quality(
            carry, chunk, t_max, template, 0, compute_dtype
        )
        candidate1 = None
    demod = aligned_demod_dynamic_fn(config, max_payload_len, compute_dtype)
    chunk_size = chunk.shape[-1]

    from anet.dsp.family import is_ofdm
    from anet.dsp.frame import data_symbols_for_payload

    fused_geom = (
        jax.default_backend() == "tpu"
        and not is_ofdm(config)
        and 128 % config.samples_per_symbol == 0
        and buffer.dtype == jnp.bfloat16
    )
    fec = getattr(config, "fec", "none")
    fused = fused_geom and fec == "none"
    # coded dynamic fast path: the energies twin feeds soft LLRs to the
    # header probe + masked-trellis Viterbi (frame.frame_result_from_
    # llrs_dynamic) — same kernel pairing as the fixed-length coded
    # stream, now on variable-length frames
    fused_coded = fused_geom and fec == "conv" and config.fec_interleave == 1
    n_sym_max = (
        data_symbols_for_payload(config, max_payload_len)
        if (fused or fused_coded)
        else 0
    )

    def demod_at(start_idx):
        """Max-window demod at a buffer index: the fused DMA-span kernels
        on the TPU hot paths (the aligned max-length frame never exists in
        HBM), the gather + demod golden pair elsewhere."""
        if fused:
            from anet.dsp.frame import dynamic_frame_result_from_tone_decisions
            from anet.kernels import demod_at_fused

            tone, best, total = demod_at_fused(
                config, buffer, start_idx, n_sym_max, start_bound=chunk_size
            )
            return dynamic_frame_result_from_tone_decisions(
                config, tone, best, total, max_payload_len
            )
        if fused_coded:
            from anet.dsp.frame import dynamic_frame_result_from_energies
            from anet.kernels import demod_at_energies_fused

            energies = demod_at_energies_fused(
                config, buffer, start_idx, n_sym_max, start_bound=chunk_size
            )
            return dynamic_frame_result_from_energies(
                config, energies, max_payload_len
            )
        aligned = _batched_dynamic_slice(buffer, start_idx, t_max, compute_dtype)
        return demod(aligned)

    rel_grid = jnp.arange(chunk_size, dtype=jnp.int32)
    pos_abs = buffer_abs0[..., None] + w0 + rel_grid  # abs start per position

    last_end = carry.last_frame_end
    detected_n = jnp.zeros_like(carry.frames_detected)
    ok_n = jnp.zeros_like(carry.frames_ok)
    err_n = jnp.zeros_like(carry.decode_errors)
    # accepted intervals so far this chunk, for exact overlap gating
    accepted: list = []  # (start_abs, end_abs, detected) triples
    outs: list = []

    for _slot in range(max_frames_per_chunk):
        if quality is None:
            best_rel, best_q = best1_rel, best1_q
        else:
            best_rel = jnp.argmax(quality, axis=-1).astype(jnp.int32)
            best_q = jnp.max(quality, axis=-1)
        start_idx = w0 + best_rel
        start_abs = buffer_abs0 + start_idx
        if candidate1 is not None:
            # lock mode: probe-validated prediction or searched candidate,
            # dedupe already applied by _find_candidate_locked
            candidate = candidate1
        else:
            candidate = (best_q >= detect_threshold) & (
                start_abs >= carry.last_frame_end - DEDUPE_SLACK
            )
        frame = demod_at(start_idx)
        # The header gate (magic + CRC, 48 bits) also vouches for the
        # declared length, so the dedupe cursor can trust it.
        detected = candidate & frame.magic_ok & frame.header_crc_ok & frame.length_ok
        t_actual = dynamic_frame_samples(config, frame.payload_len)
        end_abs = start_abs + t_actual
        # Exact interval check against every frame already accepted this
        # chunk: candidates are picked in QUALITY order, so this one may
        # precede an accepted frame in time — its end must then clear
        # that frame's start.
        for a_start, a_end, a_det in accepted:
            clear = jnp.where(start_abs < a_start, end_abs <= a_start, start_abs >= a_end)
            detected = detected & (clear | ~a_det)
        frame = frame._replace(ok=frame.ok & detected)
        accepted.append((start_abs, end_abs, detected))
        last_end = jnp.maximum(last_end, jnp.where(detected, end_abs, carry.last_frame_end))
        detected_n = detected_n + detected.astype(jnp.int32)
        ok_n = ok_n + frame.ok.astype(jnp.int32)
        err_n = err_n + (detected & ~frame.ok).astype(jnp.int32)
        outs.append(
            DynamicStreamStepOutput(
                frame=frame, detected=detected, quality=best_q, frame_start=start_abs
            )
        )
        if _slot + 1 < max_frames_per_chunk:
            # Mask this frame's extent (when accepted) plus the picked
            # position itself, then go again for the next-best candidate.
            covered = detected[..., None] & (pos_abs >= start_abs[..., None]) & (
                pos_abs < end_abs[..., None]
            )
            picked = rel_grid == best_rel[..., None]
            quality = jnp.where(covered | picked, -jnp.inf, quality)

    if lock:
        # a detection (re)locks the stream with the next start predicted
        # from the DECLARED length (header CRC vouches for it); a
        # mid-flight prediction keeps its lock; everything else re-acquires
        # by full search next chunk — same semantics as stream_step's lock
        start0, end0, det0 = accepted[0]
        locked_new = det0 | mid_flight
        drift_new = _drift_update(carry, det0, start0)
        next_start_new = jnp.where(
            det0, end0 + _drift_round(drift_new), carry.next_start
        )
    else:
        locked_new = carry.locked
        next_start_new = carry.next_start
        drift_new = carry.drift
    new_carry = StreamCarry(
        buffer=buffer,
        samples_seen=samples_seen,
        last_frame_end=last_end,
        frames_detected=carry.frames_detected + detected_n,
        frames_ok=carry.frames_ok + ok_n,
        decode_errors=carry.decode_errors + err_n,
        locked=locked_new,
        next_start=next_start_new,
        drift=drift_new,
    )
    if max_frames_per_chunk == 1:
        return new_carry, outs[0]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *outs)
    return new_carry, stacked


def receive_stream_dynamic(
    config,
    capture: jnp.ndarray,
    chunk_size: int,
    max_payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    carry: StreamCarry | None = None,
    compute_dtype=jnp.float32,
    max_frames_per_chunk: int = 1,
    lock: bool = False,
) -> StreamResult:
    """receive_stream with per-frame payload lengths from the headers.

    The capture must extend a max-length frame past the last frame start
    (pad with zeros) — detection fires once a full max window is buffered.
    ``max_frames_per_chunk > 1`` decodes that many non-overlapping frames
    per chunk (see stream_step_dynamic) — the steps then carry a per-chunk
    candidate axis: steps.detected is [num_chunks, K, ...].

    ``lock=True`` is dynamic frame-lock (see stream_step_dynamic): the
    header-declared length predicts the next frame start exactly, so
    back-to-back mixed-length frames stream at probe cost. Use
    chunk_size <= the minimum expected frame length so at most one frame
    completes per chunk.
    """
    n = capture.shape[-1]
    if n % chunk_size:
        raise ValueError(
            f"capture length {n} not a multiple of chunk_size {chunk_size}"
        )
    batch_shape = capture.shape[:-1]
    if carry is None:
        carry = init_carry(
            config, chunk_size, max_payload_len, batch_shape, dtype=compute_dtype
        )

    num_chunks = n // chunk_size
    cap = _ingest_cast(capture, carry.buffer.dtype).reshape(
        batch_shape + (num_chunks, chunk_size)
    )

    def step(c, i):
        chunk = jax.lax.dynamic_index_in_dim(cap, i, axis=-2, keepdims=False)
        return stream_step_dynamic(
            config,
            c,
            chunk,
            max_payload_len,
            detect_threshold,
            compute_dtype,
            max_frames_per_chunk,
            lock,
        )

    final_carry, outs = jax.lax.scan(step, carry, jnp.arange(num_chunks))
    return StreamResult(carry=final_carry, steps=outs)


def receive_stream(
    config,
    capture: jnp.ndarray,
    chunk_size: int,
    payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    carry: StreamCarry | None = None,
    compute_dtype=jnp.float32,
    track: bool = False,
    lock: bool = False,
    resident: bool | None = None,
) -> StreamResult:
    """Scan a capture chunk-by-chunk, emitting every frame found.

    Args:
      capture: float [..., N]; N must be a multiple of chunk_size (pad with
        zeros host-side — the final() analog).
      carry: resume state from a previous call (checkpoint/resume); fresh
        state if None.
      lock: frame-lock mode — steady-state chunks verify the predicted next
        frame with a cheap probe instead of searching every lag (see
        stream_step); same decoded frames, much faster when frames arrive
        back-to-back (the production case, like the reference's TCP
        framing).
      resident: capture-RESIDENT lock scan (_receive_stream_resident):
        the whole capture is already on device, so instead of copying it
        chunk-by-chunk through a sliding carry buffer (~9 ms/step of
        pure data movement at the bench size), the probe and the fused
        demod read the capture in place at absolute positions and the
        scan carries only counters. Decoded frames are identical. None =
        auto: on when lock mode, a fresh carry, and the fused-demod
        geometry apply (TPU, uncoded MFSK, bf16, 128 %% sps == 0).
        Explicit True with a caller-supplied carry treats the carry's
        buffer as all-zero history (the init_carry state) — only pass
        carries whose buffer holds no live samples (e.g. a warm-lock
        seed); resuming a mid-stream checkpoint needs resident=False.
    Returns:
      StreamResult(final carry, per-chunk outputs stacked along a leading
      chunk axis of the `steps` field).
    """
    n = capture.shape[-1]
    if n % chunk_size:
        raise ValueError(f"capture length {n} not a multiple of chunk_size {chunk_size}")
    batch_shape = capture.shape[:-1]
    if resident is None:
        resident = (
            lock
            and carry is None
            and _resident_supported(config, compute_dtype, track)
        )
    if resident:
        if not lock:
            raise ValueError("resident=True requires lock=True")
        if not _resident_supported(config, compute_dtype, track):
            raise ValueError(
                "resident=True needs the fused-demod geometry: TPU backend, "
                "uncoded MFSK, bfloat16 compute, 128 %% samples_per_symbol == 0"
            )
        return _receive_stream_resident(
            config, capture, chunk_size, payload_len, detect_threshold,
            compute_dtype, carry,
        )
    if carry is None:
        carry = init_carry(
            config, chunk_size, payload_len, batch_shape, track, dtype=compute_dtype
        )

    # time-major chunks for scan: [num_chunks, ..., chunk_size]
    num_chunks = n // chunk_size
    # One up-front cast to the buffer dtype (bf16 on the hot path; int8
    # buffers QUANTIZE here — a plain astype would truncate sub-unit
    # samples to zero), then scan over chunk INDICES with in-place
    # slicing: a time-major moveaxis here materialized a full copy of
    # the capture (4.3 GB at the bench size) before the first chunk was
    # processed.
    cap = _ingest_cast(capture, carry.buffer.dtype).reshape(
        batch_shape + (num_chunks, chunk_size)
    )

    def step(c, i):
        chunk = jax.lax.dynamic_index_in_dim(cap, i, axis=-2, keepdims=False)
        return stream_step(
            config, c, chunk, payload_len, detect_threshold, compute_dtype, track,
            lock,
        )

    final_carry, outs = jax.lax.scan(step, carry, jnp.arange(num_chunks))
    return StreamResult(carry=final_carry, steps=outs)


def _resident_supported(config, compute_dtype, track: bool) -> bool:
    """The capture-resident lock scan needs the fused DMA-span demod:
    TPU backend, uncoded MFSK, bf16 compute, 128 % sps == 0 (mirrors
    stream_step's `fused` gate), and no symbol-clock tracking."""
    from anet.dsp.family import is_ofdm

    return (
        jax.default_backend() == "tpu"
        and not is_ofdm(config)
        and getattr(config, "fec", "none") == "none"
        and 128 % config.samples_per_symbol == 0
        and jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
        and not track
    )


def _receive_stream_resident(
    config,
    capture: jnp.ndarray,
    chunk_size: int,
    payload_len: int,
    detect_threshold: float,
    compute_dtype,
    carry: StreamCarry | None,
    interpret: bool = False,
) -> StreamResult:
    """Capture-resident frame-lock scan — the slide-free fast path.

    The chunked-carry scan exists to model a receiver that sees one chunk
    at a time; when the caller hands the WHOLE capture to receive_stream,
    sliding it chunk-by-chunk through a carry buffer is pure overhead:
    at the bench geometry the slide concat + chunk slice move ~1.7 GB of
    HBM per step (~9 ms) to give the kernels a contiguous window they do
    not need — the probe and demod_at_fused already read per-stream spans
    from HBM by absolute index. Here the capture is padded ONCE
    (t_frame zeros of history on the left — exactly the zero-initialized
    carry buffer's state — and the demod span pad on the right) and the
    scan carries only counters and lock state.

    Equivalence with the carry path: position arithmetic maps buffer
    index b of step i to padded-capture index i*chunk + b, so candidate
    windows, dedupe, probe clipping, and the search-on-miss cond mirror
    _find_candidate_locked line for line; a CPU interpret test pins the
    decoded frames equal. The returned carry materializes the sliding
    buffer (one slice of the capture tail) so checkpoint/resume works
    unchanged.

    The reference analog is unchanged (network.cpp:409-430 ->
    playback.cpp:80-143): this is the same receiver, minus copies the
    functional formulation had introduced.

    MEASURED OUTCOME on this TPU runtime (why bench.py does NOT use it):
    end-to-end it is SLOWER than the carry path (7488 vs 9236 Msamp/s,
    warm-locked, B=8192) even though it removes a measured ~9 ms/step of
    slide+slice copies — demod_at_fused's per-call cost scales with the
    SIZE of its HBM operand (19.9 ms on a 1-chunk buffer, 26.6 on 3,
    40.6 on 7 — same spans, same starts; docs/PERF.md round-3 resident
    section), so handing the kernel the whole capture costs more than the
    copies saved. Kept (tested, checkpoint-compatible) for runtimes
    without that pathology and as the measured record.
    """
    from anet.dsp.frame import (
        data_symbols_for_payload,
        frame_result_from_tone_decisions,
    )
    from anet.dsp.sync import preamble_quality_probe
    from anet.kernels import demod_at_buffer_pad, demod_at_fused, sync_search_fused

    n = capture.shape[-1]
    num_chunks = n // chunk_size
    batch_shape = capture.shape[:-1]
    t_frame, template, _demod = family_geometry(config, payload_len, compute_dtype)
    if chunk_size > t_frame:
        raise ValueError("resident scan needs chunk_size <= frame length")
    k = template.shape[-1]
    t_c = template.astype(compute_dtype)
    t_energy = jnp.sum(t_c.astype(jnp.float32) ** 2)
    n_symbols = data_symbols_for_payload(config, payload_len)

    if carry is None:
        carry = init_carry(
            config, chunk_size, payload_len, batch_shape, False,
            dtype=compute_dtype,
        )

    # One-time pad: t_frame zeros of left history (the carry buffer's
    # initial state) + the demod-span tail on the right. Padded index
    # p = stream-absolute index + t_frame. The demod start bound covers
    # probe-refined starts, whose window clip can land ~4*128 past n.
    bound_p = n + 512
    right = demod_at_buffer_pad(
        config, n_symbols, start_bound=bound_p, live_length=t_frame + n
    )
    right = max(right, k + 4 * 128)
    # keep the padded capture lane-aligned or demod_at_fused pads a full
    # copy per step
    right += (-(t_frame + n + right)) % 128
    zshape_l = batch_shape + (t_frame,)
    zshape_r = batch_shape + (right,)
    xcap = jnp.concatenate(
        [
            jnp.zeros(zshape_l, compute_dtype),
            capture.astype(compute_dtype),
            jnp.zeros(zshape_r, compute_dtype),
        ],
        axis=-1,
    )
    # probe window: covers every clipped probe position of one step
    wlen = chunk_size + k + 4 * 128

    def step(c, i):
        w0p = i * chunk_size + 1  # padded index of the window's first start
        pred_p = c.next_start + t_frame  # stored drift-adjusted
        in_win = c.locked & (pred_p >= w0p) & (pred_p < w0p + chunk_size)
        mid_flight = c.locked & (pred_p >= w0p + chunk_size)

        # probe on a sliced window (bounded cost; positions outside the
        # window belong to streams whose probe result is ignored)
        base0 = jnp.maximum(w0p - 128, 0)
        win = jax.lax.dynamic_slice_in_dim(xcap, base0, wlen, axis=-1)
        probe_at = jnp.clip(pred_p - base0, 0, chunk_size + 256)
        q5, st0w = preamble_quality_probe(
            win, probe_at, t_c, t_energy, n_lags=PROBE_LAGS,
            compute_dtype=compute_dtype, start_bound=chunk_size + 256,
        )
        st0_p = base0 + st0w
        probe_q = jnp.max(q5, axis=-1)
        probe_off = jnp.argmax(q5, axis=-1).astype(jnp.int32)
        pred_valid = in_win & (probe_q >= detect_threshold)

        need_search = jnp.any(~(pred_valid | mid_flight))

        def do_search(_):
            seg = jax.lax.dynamic_slice_in_dim(
                xcap, w0p, chunk_size + k - 1, axis=-1
            )
            if (
                jax.default_backend() == "tpu" and chunk_size % 128 == 0
            ) or interpret:
                bq, br = sync_search_fused(
                    seg, t_c, chunk_size, t_energy, interpret=interpret
                )
                return bq, br.astype(jnp.int32)
            corr = correlate_template(seg, t_c, method="matmul")
            quality = blockwise_match_quality(seg, corr, k, t_energy)
            return (
                jnp.max(quality, axis=-1),
                jnp.argmax(quality, axis=-1).astype(jnp.int32),
            )

        def skip_search(_):
            z = jnp.zeros(c.samples_seen.shape, jnp.float32)
            return z, jnp.zeros(c.samples_seen.shape, jnp.int32)

        best_q, best_rel = jax.lax.cond(need_search, do_search, skip_search, None)

        refined_p = st0_p + probe_off
        start_p = jnp.where(pred_valid, refined_p, w0p + best_rel)
        start_abs = start_p - t_frame
        quality = jnp.where(pred_valid, probe_q, best_q)
        searched_ok = (best_q >= detect_threshold) & (
            (w0p + best_rel - t_frame) >= c.last_frame_end - DEDUPE_SLACK
        )
        candidate = pred_valid | (~mid_flight & searched_ok)

        tone, best, total = demod_at_fused(
            config, xcap, start_p, n_symbols,
            start_bound=bound_p, interpret=interpret,
        )
        frame = frame_result_from_tone_decisions(
            config, tone, best, total, payload_len
        )
        detected = candidate & frame.magic_ok & frame.header_crc_ok
        frame = frame._replace(ok=frame.ok & detected)

        locked_new = detected | mid_flight
        drift_new = _drift_update(c, detected, start_abs)
        next_start_new = jnp.where(
            detected, start_abs + t_frame + _drift_round(drift_new),
            c.next_start,
        )
        new_c = StreamCarry(
            buffer=c.buffer,  # placeholder scalar; materialized at the end
            samples_seen=c.samples_seen + chunk_size,
            last_frame_end=jnp.where(
                detected, start_abs + t_frame, c.last_frame_end
            ),
            frames_detected=c.frames_detected + detected.astype(jnp.int32),
            frames_ok=c.frames_ok + frame.ok.astype(jnp.int32),
            decode_errors=c.decode_errors
            + (detected & ~frame.ok).astype(jnp.int32),
            locked=locked_new,
            next_start=next_start_new,
            drift=drift_new,
        )
        out = StreamStepOutput(
            frame=frame, detected=detected, quality=quality,
            frame_start=start_abs,
        )
        return new_c, out

    # the scan carries a DUMMY scalar in the buffer slot so the 1+ GB
    # sliding window never rides the carry; the real buffer is cut from
    # the capture tail afterwards (checkpoint/resume compatibility)
    carry0 = carry._replace(buffer=jnp.zeros((), compute_dtype))
    final_c, outs = jax.lax.scan(step, carry0, jnp.arange(num_chunks))

    live = t_frame + chunk_size
    length = _buffer_len(config, chunk_size, payload_len, False)
    tail = jax.lax.slice_in_dim(
        xcap, n + t_frame - live, n + t_frame, axis=-1
    )
    buffer = jnp.concatenate(
        [tail, jnp.zeros(batch_shape + (length - live,), compute_dtype)],
        axis=-1,
    )
    return StreamResult(carry=final_c._replace(buffer=buffer), steps=outs)
