"""int8 sliding stream buffer (stream.INT8_STREAM_SCALE / quantize_int8).

The locked stream's per-step cost is dominated by the per-stream span
DMAs and the slab shift of the merged probe+demod kernel
(anet.kernels.demod_probe_fused — docs/PERF.md round-4/5 bisections); an
int8 buffer halves every byte of that traffic. Quantization happens ONCE
per chunk at the _slide_buffer append edge (fixed scale — a per-chunk
max would mix units across the chunk boundaries a frame span straddles);
the kernels take the int8 x int8 -> int32 MXU path with a x127 basis and
template, and every downstream quality/decision is a ratio in buffer
units, so the scale cancels end to end. These tests pin:

- the int8 merged kernel against the bf16 kernel (interpret mode): same
  servo offsets, same tone decisions, same decoded frames, quality
  within quantization tolerance;
- demod_at_fused / demod_at_energies_fused on int8 buffers against the
  f32 golden demod;
- receive_stream end-to-end with an int8 carry on CPU (jnp fallback
  paths) and through the merged kernel (interpret): identical decoded
  payloads to the f32 search mode at operating noise.

Reference anchor for the fixed-point decode principle: the firmware
decodes Opus in fixed point on-device
(/root/reference/hardware/lib/libopus/src/config.h:29, FIXED_POINT 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anet.dsp import family
from anet.dsp.frame import (
    data_symbols_for_payload,
    frame_result_from_tone_decisions,
)
from anet.dsp.sync import preamble_waveform
from anet.models import get_model
from anet.stream import (
    INT8_STREAM_SCALE,
    init_carry,
    quantize_int8,
    receive_stream,
)

CFG = get_model("mfsk16-fast").config
PAY = 64
T_FRAME = family.frame_samples(CFG, PAY)
CHUNK = 4096


def _planted_frames(rng, starts, noise=0.05):
    """One planted frame per stream at the given absolute starts."""
    tx = jax.jit(family.transmit_fn(CFG))
    b = len(starts)
    pays = rng.integers(0, 256, (b, PAY), dtype=np.uint8)
    waves = np.asarray(tx(jnp.asarray(pays)), np.float32)
    length = -(-(max(starts) + T_FRAME + 2048) // 128) * 128
    sig = np.zeros((b, length), np.float32)
    for i, p in enumerate(starts):
        sig[i, p : p + T_FRAME] = waves[i]
    sig += noise * rng.standard_normal(sig.shape).astype(np.float32)
    return sig, pays


def test_quantize_int8_scale_and_clip():
    x = jnp.asarray([0.0, 1.0, -1.0, 3.96, -3.97, 100.0, -100.0, 1 / 32.0])
    q = np.asarray(quantize_int8(x))
    assert q.dtype == np.int8
    np.testing.assert_array_equal(q, [0, 32, -32, 127, -127, 127, -127, 1])
    assert INT8_STREAM_SCALE == 32.0


def test_demod_probe_fused_int8_matches_bf16():
    """Merged probe+demod kernel (interpret) on an int8-quantized buffer:
    same servo offset and tone decisions as the bf16 kernel, quality
    within quantization tolerance, and the decoded frames identical —
    across start residues including the 128-lane row boundary."""
    from anet.kernels import demod_probe_fused

    rng = np.random.default_rng(11)
    starts = [126 + 2, 127 + 2, 0 + 256, 64 + 256, 124, 3000, 5001]
    sig, pays = _planted_frames(rng, starts)
    n_symbols = data_symbols_for_payload(CFG, PAY)
    tmpl = preamble_waveform(CFG)
    te = float(jnp.sum(tmpl * tmpl))
    st0 = jnp.asarray([p - 2 for p in starts], jnp.int32)

    buf16 = jnp.asarray(sig).astype(jnp.bfloat16)
    buf8 = quantize_int8(jnp.asarray(sig))
    assert buf8.dtype == jnp.int8

    out16 = demod_probe_fused(
        CFG, buf16, st0, n_symbols, tmpl.astype(jnp.bfloat16),
        start_bound=max(starts), interpret=True,
    )
    out8 = demod_probe_fused(
        CFG, buf8, st0, n_symbols, tmpl,
        start_bound=max(starts), interpret=True,
    )
    cmax16, off16, en16, tone16, best16, total16 = out16
    cmax8, off8, en8, tone8, best8, total8 = out8

    np.testing.assert_array_equal(np.asarray(off8), np.asarray(off16))
    np.testing.assert_array_equal(np.asarray(off8), 2)
    np.testing.assert_array_equal(np.asarray(tone8), np.asarray(tone16))

    # normalized probe quality: buffer scale cancels between cmax and
    # sqrt(energy) (the wrapper undoes the TEMPLATE quantization), so
    # the int8 q matches the bf16 q up to quantization noise
    def q_of(cmax, en):
        return np.asarray(cmax) / np.sqrt(
            te * np.maximum(np.asarray(en), 1e-4 * te)
        )

    q16, q8 = q_of(cmax16, en16), q_of(cmax8, en8)
    assert (q8 > 0.9).all(), q8
    np.testing.assert_allclose(q8, q16, atol=0.03)

    fr8 = frame_result_from_tone_decisions(CFG, tone8, best8, total8, PAY)
    assert bool(np.asarray(fr8.ok).all())
    np.testing.assert_array_equal(np.asarray(fr8.payload), pays)
    # conf/snr are ratios — scale-free within quantization tolerance
    fr16 = frame_result_from_tone_decisions(CFG, tone16, best16, total16, PAY)
    np.testing.assert_allclose(
        np.asarray(fr8.confidence), np.asarray(fr16.confidence), atol=0.02
    )


def test_demod_at_fused_int8_decodes():
    """demod_at_fused (interpret) on an int8 buffer at exact frame starts
    decodes every planted frame; decisions equal the f32 golden demod."""
    from anet.dsp.frame import demodulate_frame
    from anet.kernels import demod_at_fused

    rng = np.random.default_rng(12)
    starts = [0, 127, 128, 1000, 4095]
    sig, pays = _planted_frames(rng, starts)
    n_symbols = data_symbols_for_payload(CFG, PAY)
    buf8 = quantize_int8(jnp.asarray(sig))
    st = jnp.asarray(starts, jnp.int32)
    tone, best, total = demod_at_fused(
        CFG, buf8, st, n_symbols, start_bound=max(starts), interpret=True
    )
    fr = frame_result_from_tone_decisions(CFG, tone, best, total, PAY)
    assert bool(np.asarray(fr.ok).all())
    np.testing.assert_array_equal(np.asarray(fr.payload), pays)
    # golden: f32 demod on the exact aligned float window
    for i, p in enumerate(starts):
        fr32 = demodulate_frame(
            CFG, jnp.asarray(sig[i, p : p + T_FRAME]), PAY
        )
        assert bool(np.asarray(fr32.ok))
        np.testing.assert_array_equal(
            np.asarray(fr.payload)[i], np.asarray(fr32.payload)
        )


def test_demod_at_energies_fused_int8_ratios():
    """Energies twin on int8: per-symbol argmax equals the f32 demod's
    and energy RATIOS match (the absolute scale carries the uniform
    (127 * buffer_scale)^2 factor by design)."""
    from anet.dsp.demod import tone_energies
    from anet.kernels import demod_at_energies_fused

    rng = np.random.default_rng(13)
    starts = [5, 700]
    sig, _pays = _planted_frames(rng, starts)
    n_symbols = data_symbols_for_payload(CFG, PAY)
    buf8 = quantize_int8(jnp.asarray(sig))
    e8 = demod_at_energies_fused(
        CFG, buf8, jnp.asarray(starts, jnp.int32), n_symbols,
        start_bound=max(starts), interpret=True,
    )
    pre = CFG.preamble_symbols * CFG.samples_per_symbol
    for i, p in enumerate(starts):
        w = jnp.asarray(sig[i, p + pre : p + pre + n_symbols * CFG.samples_per_symbol])
        e32 = tone_energies(CFG, w)
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(e8[i], axis=-1)),
            np.asarray(jnp.argmax(e32, axis=-1)),
        )
        # ratio check on the winning tone vs total, scale-free
        r8 = np.asarray(jnp.max(e8[i], -1) / jnp.sum(e8[i], -1))
        r32 = np.asarray(jnp.max(e32, -1) / jnp.sum(e32, -1))
        np.testing.assert_allclose(r8, r32, atol=0.02)


@pytest.mark.parametrize("lock", [False, True])
def test_receive_stream_int8_carry_cpu(lock):
    """End-to-end receive_stream with an int8 carry on the CPU jnp paths:
    float chunks quantize at the append edge; every frame decodes with
    payloads identical to the f32 search mode."""
    rng = np.random.default_rng(21)
    b, n_frames = 2, 3
    tx = jax.jit(family.transmit_fn(CFG))
    pays = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
    waves = np.asarray(
        tx(jnp.asarray(pays.reshape(b * n_frames, PAY))), np.float32
    ).reshape(b, n_frames, T_FRAME)
    gaps = [[450] + [0] * (n_frames - 1), [777] + [5, 1]]
    caps = []
    for s in range(b):
        sig = []
        for i in range(n_frames):
            sig.append(np.zeros(gaps[s][i], np.float32))
            sig.append(waves[s, i])
        caps.append(np.concatenate(sig))
    length = -(-(max(len(c) for c in caps) + T_FRAME + CHUNK) // CHUNK) * CHUNK
    cap = np.zeros((b, length), np.float32)
    for s, c in enumerate(caps):
        cap[s, : len(c)] = c
    cap += 0.05 * rng.standard_normal(cap.shape).astype(np.float32)
    cap = jnp.asarray(cap)

    r32 = receive_stream(CFG, cap, CHUNK, PAY, lock=False)
    carry8 = init_carry(CFG, CHUNK, PAY, (b,), dtype=jnp.int8)
    r8 = receive_stream(CFG, cap, CHUNK, PAY, lock=lock, carry=carry8)
    assert r8.carry.buffer.dtype == jnp.int8
    assert int(r8.carry.frames_ok.sum()) == b * n_frames
    det32 = np.asarray(r32.steps.detected)
    det8 = np.asarray(r8.steps.detected)
    np.testing.assert_array_equal(det8, det32)
    np.testing.assert_array_equal(
        np.asarray(r8.steps.frame.payload)[det8],
        np.asarray(r32.steps.frame.payload)[det32],
    )


def test_lock_merged_kernel_int8(interpret_tpu_kernels):
    """The merged locked step through demod_probe_fused with an int8
    carry (interpret): decodes identically to the CPU f32 lock path on a
    contiguous-frames layout, with zero searches after acquisition."""
    rng = np.random.default_rng(0x18)
    b, n_frames = 2, 4
    tx = jax.jit(family.transmit_fn(CFG))
    pays = rng.integers(0, 256, (b, n_frames, PAY), dtype=np.uint8)
    waves = np.asarray(
        tx(jnp.asarray(pays.reshape(b * n_frames, PAY))), np.float32
    ).reshape(b, n_frames, T_FRAME)
    gap0 = [450, 127 + 1024]  # one start residue near the row boundary
    length = -(-(max(gap0) + n_frames * T_FRAME + CHUNK) // CHUNK) * CHUNK
    cap = np.zeros((b, length), np.float32)
    for s in range(b):
        pos = gap0[s]
        for i in range(n_frames):
            cap[s, pos : pos + T_FRAME] = waves[s, i]
            pos += T_FRAME
    cap += 0.05 * rng.standard_normal(cap.shape).astype(np.float32)
    cap = jnp.asarray(cap)

    r32 = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
    interpret_tpu_kernels()  # golden computed — flip to 'pretend TPU'
    carry8 = init_carry(CFG, CHUNK, PAY, (b,), dtype=jnp.int8)
    r8 = receive_stream(
        CFG, cap, CHUNK, PAY, lock=True, carry=carry8,
        compute_dtype=jnp.bfloat16,
    )
    assert int(r8.carry.frames_ok.sum()) == b * n_frames
    det32 = np.asarray(r32.steps.detected)
    det8 = np.asarray(r8.steps.detected)
    np.testing.assert_array_equal(det8, det32)
    np.testing.assert_array_equal(
        np.asarray(r8.steps.frame.payload)[det8],
        np.asarray(r32.steps.frame.payload)[det32],
    )
    np.testing.assert_array_equal(
        np.asarray(r8.steps.frame_start)[det8],
        np.asarray(r32.steps.frame_start)[det32],
    )


def test_cli_stream_rx_int8(tmp_path, capsys):
    """`anet modem-stream-rx --int8`: the int8 sliding-buffer path through
    the CLI recovers the same payloads as the default run, and the flag's
    composition rules hold (--track, coded models, dynamic mode rejected)."""
    from anet.channel import awgn
    from anet.cli import main

    rng = np.random.default_rng(0x51)
    chunks = [rng.integers(0, 256, PAY, np.uint8) for _ in range(2)]
    tx = jax.jit(family.transmit_fn(CFG))
    parts = [np.zeros(500, np.float32)]
    for c in chunks:
        parts += [np.asarray(tx(jnp.asarray(c)[None])[0], np.float32),
                  np.zeros(700, np.float32)]
    cap = awgn(jax.random.PRNGKey(0), jnp.asarray(np.concatenate(parts)), 6.0)
    path = tmp_path / "cap.f32"
    np.asarray(cap, np.float32).tofile(path)
    out = tmp_path / "payloads.bin"
    rc = main([
        "modem-stream-rx", str(path), "--len", str(PAY),
        "--model", "mfsk16-fast", "--int8", "--out", str(out),
    ])
    assert rc == 0
    assert out.read_bytes() == b"".join(c.tobytes() for c in chunks)
    assert "2 ok" in capsys.readouterr().out

    # composition gates
    assert main([
        "modem-stream-rx", str(path), "--len", str(PAY),
        "--model", "mfsk16-fast", "--int8", "--track",
    ]) == 2
    assert main([
        "modem-stream-rx", str(path), "--len", str(PAY),
        "--model", "mfsk4-coded", "--int8",
    ]) == 2
    assert main([
        "modem-stream-rx", str(path),
        "--model", "mfsk16-fast", "--int8",
    ]) == 2
    capsys.readouterr()
