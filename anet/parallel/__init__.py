"""Multi-device scale-out: mesh construction, sharded demod, BER sweeps.

The reference's "distribution" is sockets: one transmitter fanning frames
to N receivers over TCP (MulticastAudioOutput.kt:88-96), with discovery on
UDP. On TPU the data plane never touches sockets (SURVEY.md §5): streams
become a batch axis laid out over a `jax.sharding.Mesh`, fan-out is a
broadcast along that axis, cross-stream aggregation (BER counts) is a
`psum` riding the ICI, and a single long capture can be split along *time*
across devices with halo exchange — the context-parallel analog, sized to
the demodulator's memory (one frame length).

Everything here works on any mesh: 8 virtual CPU devices in tests, a v5e
slice in production; the code is identical.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from anet.channel import ChannelConfig, apply_channel
from anet.dsp import family
from anet.dsp.frame import FrameResult, demodulate_frame
from anet.dsp.params import ModemConfig
from anet.stream import (
    DEFAULT_DETECT_THRESHOLD,
    DynamicStreamStepOutput,
    StreamStepOutput,
    init_carry,
    receive_stream,
    receive_stream_dynamic,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_streams",
    "sharded_demodulate",
    "BerPoint",
    "ber_sweep",
    "ShardedResume",
    "sharded_receive_long_capture",
    "sharded_receive_long_capture_dynamic",
    "sharded_receive_capture_grid",
    "sharded_receive_capture_grid_dynamic",
]

STREAM_AXIS = "streams"
TIME_AXIS = "time"


def make_mesh_2d(
    n_stream_devices: int,
    n_time_devices: int,
    axis_names: "tuple[str, str]" = (STREAM_AXIS, TIME_AXIS),
) -> Mesh:
    """2-D mesh: independent streams on one axis, time segments of each
    stream on the other — the DP x CP composition for capture farms."""
    total = n_stream_devices * n_time_devices
    available = jax.devices()
    if len(available) < total:
        raise ValueError(
            f"mesh {n_stream_devices}x{n_time_devices} needs {total} devices, "
            f"have {len(available)}"
        )
    devices = np.asarray(available[:total]).reshape(
        n_stream_devices, n_time_devices
    )
    return Mesh(devices, axis_names)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = STREAM_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_streams(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Lay an array out with its leading (stream/batch) axis sharded."""
    spec = P(mesh.axis_names[0], *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def sharded_demodulate(
    config: ModemConfig,
    mesh: Mesh,
    waves: jnp.ndarray,
    payload_len: int,
    compute_dtype=jnp.float32,
) -> FrameResult:
    """Demodulate a batch of aligned frames, batch axis sharded over the mesh.

    The per-device computation has no cross-stream dependencies, so this is
    pure SPMD: XLA inserts no collectives; each device demodulates its
    shard's streams on its own MXU.
    """
    axis = mesh.axis_names[0]

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=P(axis, None),
        out_specs=jax.tree_util.tree_map(lambda _: P(axis), _frame_result_proto()),
    )
    def _demod(w):
        # family dispatch: MFSK takes demodulate_frame's compute_dtype
        # surface; OFDM routes through its own aligned demod (complex
        # equalizer — family.aligned_demod_fn)
        if family.is_ofdm(config):
            return family.aligned_demod_fn(config, payload_len, compute_dtype)(w)
        return demodulate_frame(config, w, payload_len, compute_dtype=compute_dtype)

    return jax.jit(_demod)(waves)


def _frame_result_proto() -> FrameResult:
    # A pytree with the same structure as FrameResult, for out_specs mapping.
    z = 0
    return FrameResult(z, z, z, z, z, z, z, z)





class BerPoint(NamedTuple):
    """Aggregated error statistics for one sweep grid point."""

    snr_db: jnp.ndarray  # float32 [G]
    bit_errors: jnp.ndarray  # int32 [G] — across all frames/devices
    total_bits: jnp.ndarray  # int32 [G]
    frame_errors: jnp.ndarray  # int32 [G] — integrity-failed frames
    total_frames: jnp.ndarray  # int32 [G]

    @property
    def ber(self) -> jnp.ndarray:
        return self.bit_errors / jnp.maximum(self.total_bits, 1)

    @property
    def fer(self) -> jnp.ndarray:
        return self.frame_errors / jnp.maximum(self.total_frames, 1)


def ber_sweep(
    config: ModemConfig,
    mesh: Mesh,
    key: jax.Array,
    snr_grid_db: Sequence[float],
    frames_per_point: int,
    payload_len: int = 64,
    channel: ChannelConfig = ChannelConfig(),
    compute_dtype=jnp.float32,
) -> BerPoint:
    """TX -> channel -> RX error-rate sweep, sharded over the mesh.

    Layout: a [G * frames_per_point] stream axis sharded over devices; each
    stream draws its own payload and noise, runs the full modulate ->
    impair -> demodulate chain, and global error counts per grid point come
    back via an in-shard-map `psum` over the stream axis — the TPU-native
    replacement for the reference's "collect stats from N receivers over
    sockets" pattern (BASELINE config 5).

    ``frames_per_point`` must be a multiple of the mesh size.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    g = len(snr_grid_db)
    if frames_per_point % n_dev:
        raise ValueError(
            f"frames_per_point={frames_per_point} must be a multiple of mesh size {n_dev}"
        )

    snrs = jnp.asarray(snr_grid_db, jnp.float32)  # [G]
    # Stream layout: [n_dev, per_dev, G] — sharded on the device axis.
    per_dev = frames_per_point // n_dev
    keys = jax.random.split(key, n_dev)
    tx_fn = family.transmit_fn(config)
    demod_fn = family.aligned_demod_fn(config, payload_len, compute_dtype)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), None),
        out_specs=(P(), P(), P()),
    )
    def _point(dev_keys, snrs_rep):
        dev_key = dev_keys[0]
        k_payload, k_chan = jax.random.split(dev_key)
        payloads = jax.random.randint(
            k_payload, (per_dev, g, payload_len), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        waves = tx_fn(payloads)  # [per_dev, G, T]
        chan_keys = jax.random.split(k_chan, per_dev)

        def impair(ck, w):
            return apply_channel(ck, w, channel, snr_db=snrs_rep)

        dirty = jax.vmap(impair)(chan_keys, waves)
        res = demod_fn(dirty)
        # bit errors: popcount of byte XOR
        xor = jnp.bitwise_xor(res.payload, payloads)
        bit_err = jnp.sum(
            _popcount8(xor), axis=(0, 2), dtype=jnp.int32
        )  # [G]
        frame_err = jnp.sum(~res.ok, axis=0, dtype=jnp.int32)  # [G]
        # Global totals: psum across devices rides the ICI.
        bit_err = jax.lax.psum(bit_err, axis)
        frame_err = jax.lax.psum(frame_err, axis)
        frames = jax.lax.psum(jnp.full((g,), per_dev, jnp.int32), axis)
        return bit_err, frame_err, frames

    bit_errors, frame_errors, total_frames = jax.jit(_point)(keys, snrs)
    total_bits = total_frames * (payload_len * 8)
    return BerPoint(
        snr_db=snrs,
        bit_errors=bit_errors,
        total_bits=total_bits,
        frame_errors=frame_errors,
        total_frames=total_frames,
    )


def _popcount8(x: jnp.ndarray) -> jnp.ndarray:
    """Per-byte popcount of a uint8 array."""
    x = x.astype(jnp.int32)
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


class ShardedResume(NamedTuple):
    """Checkpoint of a sharded receive, for continuing the SAME logical
    stream across successive sharded calls (SURVEY.md §5 checkpoint/
    resume composed with scale-out).

    ``tail`` is the stream's last ``halo`` samples (one demodulator memory),
    which becomes device 0's left context next call; ``last_frame_end`` is
    the global dedupe cursor — for dynamic-length streams it reflects the
    ACTUAL length of the last accepted frame, so a frame straddling the
    super-step boundary is not re-detected by the next call. Counters are
    cumulative. Serialize with np.savez like stream.save_carry.
    """

    tail: jnp.ndarray  # float [halo] (1-D) or [B, halo] (grid)
    samples_seen: jnp.ndarray  # int32 scalar — total samples consumed
    last_frame_end: jnp.ndarray  # int32 — global ([] or [B])
    frames_detected: jnp.ndarray  # int32 — cumulative global
    frames_ok: jnp.ndarray  # int32
    decode_errors: jnp.ndarray  # int32


class ShardedStreamResult(NamedTuple):
    steps: StreamStepOutput  # per-chunk outputs, chunk axis global-ordered
    frames_detected: jnp.ndarray  # int32 scalar — global
    frames_ok: jnp.ndarray  # int32 scalar — global
    decode_errors: jnp.ndarray  # int32 scalar — global
    resume: Optional[ShardedResume] = None  # continue-the-stream checkpoint


def _segment_geometry(config, n, n_dev, chunk_size, payload_len):
    t_frame = family.frame_samples(config, payload_len)
    seg = n // n_dev
    if n % n_dev or seg % chunk_size:
        raise ValueError(
            f"capture length {n} must split into {n_dev} segments of whole "
            f"{chunk_size}-sample chunks"
        )
    halo = t_frame + chunk_size  # stream buffer length
    if seg < halo:
        raise ValueError(
            f"per-device segment of {seg} samples is shorter than the "
            f"demodulator memory ({halo}); use fewer devices or a longer capture"
        )
    return seg, halo


def _resume_inputs(resume, halo, batch_shape=()):
    """(tail, samples_base, cursor, counter-triple) for a fresh or resumed
    sharded receive; validates the halo geometry on resume."""
    zi = jnp.zeros(batch_shape, jnp.int32)
    if resume is None:
        return (
            jnp.zeros(batch_shape + (halo,), jnp.float32),
            jnp.zeros((), jnp.int32),
            zi,
            (zi.sum(), zi.sum(), zi.sum()),
        )
    if resume.tail.shape != batch_shape + (halo,):
        raise ValueError(
            f"resume.tail shape {resume.tail.shape} != expected "
            f"{batch_shape + (halo,)}; same config/chunk/payload required"
        )
    return (
        resume.tail.astype(jnp.float32),
        resume.samples_seen.astype(jnp.int32),
        resume.last_frame_end.astype(jnp.int32),
        (
            resume.frames_detected,
            resume.frames_ok,
            resume.decode_errors,
        ),
    )


def sharded_receive_long_capture(
    config: ModemConfig,
    mesh: Mesh,
    capture: jnp.ndarray,
    chunk_size: int,
    payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    resume: Optional[ShardedResume] = None,
    lock: bool = False,
) -> ShardedStreamResult:
    """Split ONE long capture along time across devices (the CP analog).

    Each device scans a contiguous time segment; the left halo — the last
    `frame_samples` of the previous device's segment, i.e. exactly the
    demodulator's memory — arrives via `jax.lax.ppermute` over the ring
    (SURVEY.md §5 long-context story). A frame is attributed to the device
    where its *end* falls, so boundary frames are found exactly once.

    ``capture``: float [N]; N must divide evenly into mesh_size segments of
    whole chunks. ``resume``: the previous call's ``result.resume`` to
    continue the same logical stream (device 0 then seeds its left halo
    and dedupe cursor from it instead of zeros, and counters accumulate).
    ``lock``: frame-lock mode per device segment — each device pays one
    search to acquire, then probe-verifies predictions (stream_step);
    decoded frames are identical either way.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = capture.shape[-1]
    seg, halo = _segment_geometry(config, n, n_dev, chunk_size, payload_len)
    tail0, seen0, cursor0, base_counts = _resume_inputs(resume, halo)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(
            jax.tree_util.tree_map(lambda _: P(axis), _stream_step_proto()),
            P(),
            P(),
            P(),
            P(),
        ),
    )
    def _scan_segment(cap_shard, tail0, seen0, cursor0):
        cap_local = cap_shard.reshape(-1)  # [seg]
        idx = jax.lax.axis_index(axis)
        # Left halo: last `halo` samples of the left neighbor's segment.
        tail = cap_local[-halo:]
        left_tail = jax.lax.ppermute(
            tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        # Device 0's left context is the previous super-step's tail
        # (zeros on a fresh stream).
        left_tail = jnp.where(idx == 0, tail0, left_tail)

        carry = init_carry(config, chunk_size, payload_len)
        carry = carry._replace(
            buffer=left_tail.astype(jnp.float32),
            samples_seen=(seen0 + idx * seg).astype(jnp.int32),
            last_frame_end=jnp.where(idx == 0, cursor0, 0).astype(jnp.int32),
        )
        res = receive_stream(
            config, cap_local, chunk_size, payload_len, detect_threshold, carry,
            lock=lock,
        )
        det = jax.lax.psum(res.carry.frames_detected, axis)
        ok = jax.lax.psum(res.carry.frames_ok, axis)
        err = jax.lax.psum(res.carry.decode_errors, axis)
        cursor = jax.lax.pmax(res.carry.last_frame_end, axis)
        # steps currently [chunks_local, ...]; emit with a leading singleton
        # shard axis so out_specs P(axis) concatenates devices in ring order.
        steps = jax.tree_util.tree_map(lambda x: x[None], res.steps)
        return steps, det, ok, err, cursor

    steps, det, ok, err, cursor = jax.jit(_scan_segment)(
        capture, tail0, seen0, cursor0
    )
    # steps: [n_dev, chunks_local, ...] -> flatten to global chunk order
    steps = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), steps
    )
    det = det + base_counts[0]
    ok = ok + base_counts[1]
    err = err + base_counts[2]
    new_resume = ShardedResume(
        tail=capture[-halo:].astype(jnp.float32),
        samples_seen=seen0 + n,
        last_frame_end=cursor,
        frames_detected=det,
        frames_ok=ok,
        decode_errors=err,
    )
    return ShardedStreamResult(
        steps=steps, frames_detected=det, frames_ok=ok, decode_errors=err,
        resume=new_resume,
    )


def _stream_step_proto() -> StreamStepOutput:
    z = 0
    return StreamStepOutput(frame=_frame_result_proto(), detected=z, quality=z, frame_start=z)


def sharded_receive_capture_grid(
    config,
    mesh: Mesh,
    captures: jnp.ndarray,
    chunk_size: int,
    payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    lock: bool = False,
) -> ShardedStreamResult:
    """A BATCH of long captures over a 2-D mesh: streams x time.

    The data-parallel and context-parallel axes compose: independent
    captures shard over the ``streams`` axis (no communication), and each
    capture's timeline splits over the ``time`` axis with the one-frame
    halo exchanged by `ppermute` ring-wise WITHIN each stream row — the
    same layout a capture farm uses on a v5e slice (mesh rows = recording
    channels, mesh columns = hours of tape).

    ``captures``: float [B, N]; B must divide by the stream-axis size, and
    N by time_axis_size * chunk_size. Counters are global (psum over both
    axes); per-chunk step outputs come back [B, total_chunks, ...].
    """
    s_axis, t_axis = mesh.axis_names
    n_s = mesh.shape[s_axis]
    n_t = mesh.shape[t_axis]
    b, n = captures.shape
    t_frame = family.frame_samples(config, payload_len)
    seg = n // n_t
    if b % n_s or n % n_t or seg % chunk_size:
        raise ValueError(
            f"captures [B={b}, N={n}] must split into [{n_s} x {n_t}] shards "
            f"of whole {chunk_size}-sample chunks"
        )
    halo = t_frame + chunk_size
    if seg < halo:
        raise ValueError(
            f"per-device time segment of {seg} samples is shorter than the "
            f"demodulator memory ({halo}); use fewer time devices or longer captures"
        )
    b_local = b // n_s

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=P(s_axis, t_axis),
        out_specs=(
            # steps emerge [1(s), b_local, 1(t), chunks_local, ...]: dim 0
            # concatenates over the stream axis, dim 2 over the time axis.
            jax.tree_util.tree_map(
                lambda _: P(s_axis, None, t_axis), _stream_step_proto()
            ),
            P(),
            P(),
            P(),
        ),
    )
    def _scan_grid(cap_shard):  # [b_local, seg]
        t_idx = jax.lax.axis_index(t_axis)
        # Left halo along the time ring, within this stream row only.
        tail = cap_shard[:, -halo:]
        left_tail = jax.lax.ppermute(
            tail, t_axis, [(i, (i + 1) % n_t) for i in range(n_t)]
        )
        left_tail = jnp.where(t_idx == 0, jnp.zeros_like(left_tail), left_tail)

        carry = init_carry(config, chunk_size, payload_len, batch_shape=(b_local,))
        carry = carry._replace(
            buffer=left_tail.astype(jnp.float32),
            samples_seen=jnp.full((b_local,), t_idx * seg, jnp.int32),
        )
        res = receive_stream(
            config, cap_shard, chunk_size, payload_len, detect_threshold, carry,
            lock=lock,
        )
        det = jax.lax.psum(
            jnp.sum(res.carry.frames_detected), (s_axis, t_axis)
        )
        ok = jax.lax.psum(jnp.sum(res.carry.frames_ok), (s_axis, t_axis))
        err = jax.lax.psum(jnp.sum(res.carry.decode_errors), (s_axis, t_axis))
        # steps: [chunks_local, b_local, ...] -> [b_local, chunks_local, ...]
        # with singleton mesh axes so out_specs concatenates rows and columns.
        steps = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 0, 1)[None, :, None], res.steps
        )
        return steps, det, ok, err

    steps, det, ok, err = jax.jit(_scan_grid)(captures)
    # steps: [n_s, b_local, n_t, chunks_local, ...] -> [B, total_chunks, ...]
    steps = jax.tree_util.tree_map(
        lambda x: x.reshape((b, -1) + x.shape[4:]), steps
    )
    return ShardedStreamResult(
        steps=steps, frames_detected=det, frames_ok=ok, decode_errors=err
    )


def _dyn_step_proto() -> DynamicStreamStepOutput:
    z = 0
    from anet.dsp.frame import DynamicFrameResult

    frame = DynamicFrameResult(z, z, z, z, z, z, z, z, z)
    return DynamicStreamStepOutput(frame=frame, detected=z, quality=z, frame_start=z)


def sharded_receive_long_capture_dynamic(
    config: ModemConfig,
    mesh: Mesh,
    capture: jnp.ndarray,
    chunk_size: int,
    max_payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    max_frames_per_chunk: int = 1,
    resume: Optional[ShardedResume] = None,
) -> ShardedStreamResult:
    """sharded_receive_long_capture with per-frame payload lengths read
    from each frame's header (the varint-length-prefixed stream analog,
    network.cpp:409-430).

    The halo/attribution geometry is sized for ``max_payload_len`` (a
    frame is attributed to the device where its max-length detection
    window completes — one device exactly, so boundary frames are found
    once). The dedupe cursor honors each frame's ACTUAL header length:
    within a device through the stream carry, across devices by
    construction (a frame's actual extent never reaches past its
    attribution point, start + t_max), and across super-steps through
    ``resume.last_frame_end``. Coded configs stream with
    fec_interleave == 1 (see stream.stream_step_dynamic — the header
    probe + masked-trellis Viterbi parses lengths without FEC state).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = capture.shape[-1]
    seg, halo = _segment_geometry(config, n, n_dev, chunk_size, max_payload_len)
    tail0, seen0, cursor0, base_counts = _resume_inputs(resume, halo)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(
            jax.tree_util.tree_map(lambda _: P(axis), _dyn_step_proto()),
            P(),
            P(),
            P(),
            P(),
        ),
    )
    def _scan_segment(cap_shard, tail0, seen0, cursor0):
        cap_local = cap_shard.reshape(-1)  # [seg]
        idx = jax.lax.axis_index(axis)
        tail = cap_local[-halo:]
        left_tail = jax.lax.ppermute(
            tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        left_tail = jnp.where(idx == 0, tail0, left_tail)

        carry = init_carry(config, chunk_size, max_payload_len)
        carry = carry._replace(
            buffer=left_tail.astype(jnp.float32),
            samples_seen=(seen0 + idx * seg).astype(jnp.int32),
            last_frame_end=jnp.where(idx == 0, cursor0, 0).astype(jnp.int32),
        )
        res = receive_stream_dynamic(
            config,
            cap_local,
            chunk_size,
            max_payload_len,
            detect_threshold,
            carry,
            max_frames_per_chunk=max_frames_per_chunk,
        )
        det = jax.lax.psum(res.carry.frames_detected, axis)
        ok = jax.lax.psum(res.carry.frames_ok, axis)
        err = jax.lax.psum(res.carry.decode_errors, axis)
        cursor = jax.lax.pmax(res.carry.last_frame_end, axis)
        steps = jax.tree_util.tree_map(lambda x: x[None], res.steps)
        return steps, det, ok, err, cursor

    steps, det, ok, err, cursor = jax.jit(_scan_segment)(
        capture, tail0, seen0, cursor0
    )
    steps = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), steps
    )
    det = det + base_counts[0]
    ok = ok + base_counts[1]
    err = err + base_counts[2]
    new_resume = ShardedResume(
        tail=capture[-halo:].astype(jnp.float32),
        samples_seen=seen0 + n,
        last_frame_end=cursor,
        frames_detected=det,
        frames_ok=ok,
        decode_errors=err,
    )
    return ShardedStreamResult(
        steps=steps, frames_detected=det, frames_ok=ok, decode_errors=err,
        resume=new_resume,
    )


def sharded_receive_capture_grid_dynamic(
    config,
    mesh: Mesh,
    captures: jnp.ndarray,
    chunk_size: int,
    max_payload_len: int,
    detect_threshold: float = DEFAULT_DETECT_THRESHOLD,
    max_frames_per_chunk: int = 1,
    resume: Optional[ShardedResume] = None,
) -> ShardedStreamResult:
    """sharded_receive_capture_grid with header-declared frame lengths:
    the DP x CP composition for a farm of variable-length streams.

    Streams shard over the ``streams`` axis, each stream's timeline splits
    over the ``time`` axis with a max-frame halo ppermute'd ring-wise
    within its row. The dedupe cursor is per-stream and honors actual
    header lengths (see sharded_receive_long_capture_dynamic); across
    super-steps it continues via ``resume.last_frame_end`` ([B]).
    """
    s_axis, t_axis = mesh.axis_names
    n_s = mesh.shape[s_axis]
    n_t = mesh.shape[t_axis]
    b, n = captures.shape
    if b % n_s:
        raise ValueError(f"B={b} must divide by the stream-axis size {n_s}")
    seg, halo = _segment_geometry(config, n, n_t, chunk_size, max_payload_len)
    b_local = b // n_s
    tail0, seen0, cursor0, base_counts = _resume_inputs(
        resume, halo, batch_shape=(b,)
    )

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(s_axis, t_axis), P(s_axis, None), P(), P(s_axis)),
        out_specs=(
            jax.tree_util.tree_map(
                lambda _: P(s_axis, None, t_axis), _dyn_step_proto()
            ),
            P(),
            P(),
            P(),
            P(s_axis),
        ),
    )
    def _scan_grid(cap_shard, tail0, seen0, cursor0):  # [b_local, seg]
        t_idx = jax.lax.axis_index(t_axis)
        tail = cap_shard[:, -halo:]
        left_tail = jax.lax.ppermute(
            tail, t_axis, [(i, (i + 1) % n_t) for i in range(n_t)]
        )
        left_tail = jnp.where(t_idx == 0, tail0, left_tail)

        carry = init_carry(
            config, chunk_size, max_payload_len, batch_shape=(b_local,)
        )
        carry = carry._replace(
            buffer=left_tail.astype(jnp.float32),
            samples_seen=jnp.full((b_local,), seen0 + t_idx * seg, jnp.int32),
            last_frame_end=jnp.where(t_idx == 0, cursor0, 0).astype(jnp.int32),
        )
        res = receive_stream_dynamic(
            config,
            cap_shard,
            chunk_size,
            max_payload_len,
            detect_threshold,
            carry,
            max_frames_per_chunk=max_frames_per_chunk,
        )
        det = jax.lax.psum(
            jnp.sum(res.carry.frames_detected), (s_axis, t_axis)
        )
        ok = jax.lax.psum(jnp.sum(res.carry.frames_ok), (s_axis, t_axis))
        err = jax.lax.psum(jnp.sum(res.carry.decode_errors), (s_axis, t_axis))
        cursor = jax.lax.pmax(res.carry.last_frame_end, t_axis)  # [b_local]
        # steps: [chunks_local, b_local, ...] (K==1) or [chunks_local, K,
        # b_local, ...]; bring b_local to the front, then add singleton
        # mesh axes so out_specs concatenates rows and columns.
        batch_dim = 1 if max_frames_per_chunk == 1 else 2
        steps = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, batch_dim, 0)[None, :, None], res.steps
        )
        return steps, det, ok, err, cursor

    steps, det, ok, err, cursor = jax.jit(_scan_grid)(
        captures, tail0, seen0, cursor0
    )
    steps = jax.tree_util.tree_map(
        lambda x: x.reshape((b, -1) + x.shape[4:]), steps
    )
    det = det + base_counts[0]
    ok = ok + base_counts[1]
    err = err + base_counts[2]
    new_resume = ShardedResume(
        tail=captures[:, -halo:].astype(jnp.float32),
        samples_seen=seen0 + n,
        last_frame_end=cursor,
        frames_detected=det,
        frames_ok=ok,
        decode_errors=err,
    )
    return ShardedStreamResult(
        steps=steps, frames_detected=det, frames_ok=ok, decode_errors=err,
        resume=new_resume,
    )
