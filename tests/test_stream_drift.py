"""Frame lock under TX/RX sample-clock drift (anet.stream StreamCarry.drift).

The ±2-sample probe servo alone tolerates ~±55 ppm at bench frame
lengths; real crystals skew up to a few hundred ppm (the reference
absorbs the same skew with its adaptive queue timeout,
playback.cpp:90,125-130). The carry's per-stream drift estimate — an EMA
of each detection's observed start offset vs the previous frame's
nominal end — shifts every prediction so the servo only covers the
RESIDUAL error: locked streams must stay locked (no per-chunk search)
under ±200 and ±500 ppm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anet.channel import sample_rate_drift
from anet.dsp import family
from anet.models import get_model
from anet.stream import init_carry, load_carry, receive_stream, save_carry

CFG = get_model("mfsk16-fast").config
PAY = 32
T_FRAME = family.frame_samples(CFG, PAY)
CHUNK = T_FRAME // 128 * 128 - 128  # < the min (compressed) frame length
N_FRAMES = 14
GAP0 = 1000


def _drifted_capture(rng, ppm, batch=2, noise=0.02):
    """Back-to-back frames, resampled by the channel's drift model."""
    tx = jax.jit(family.transmit_fn(CFG))
    pays = rng.integers(0, 256, (batch, N_FRAMES, PAY), dtype=np.uint8)
    waves = np.asarray(
        tx(jnp.asarray(pays.reshape(batch * N_FRAMES, PAY)))
    ).reshape(batch, N_FRAMES, T_FRAME)
    length = GAP0 + N_FRAMES * T_FRAME + T_FRAME + CHUNK
    length = -(-length // CHUNK) * CHUNK
    cap = np.zeros((batch, length), np.float32)
    for i in range(N_FRAMES):
        cap[:, GAP0 + i * T_FRAME : GAP0 + (i + 1) * T_FRAME] = waves[:, i]
    cap = np.array(jax.jit(lambda x: sample_rate_drift(x, ppm))(jnp.asarray(cap)))
    cap += noise * rng.standard_normal(cap.shape).astype(np.float32)
    return jnp.asarray(cap), pays


def _per_frame_drift(ppm):
    """Apparent per-frame start drift after the RX-fast resample: frame
    positions scale by 1/(1 + ppm*1e-6)."""
    return T_FRAME / (1.0 + ppm * 1e-6) - T_FRAME


@pytest.mark.parametrize("ppm", [200.0, 500.0, -200.0, -500.0])
def test_lock_converges_and_decodes_under_drift(ppm):
    """Cold carry: the estimate converges within a few frames (search
    covers the transient) and every frame decodes."""
    rng = np.random.default_rng(int(abs(ppm)))
    cap, pays = _drifted_capture(rng, ppm)
    res = receive_stream(CFG, cap, CHUNK, PAY, lock=True)
    assert int(res.carry.frames_ok.sum()) == 2 * N_FRAMES
    assert int(res.carry.decode_errors.sum()) == 0
    det = np.asarray(res.steps.detected)
    got = sorted(map(bytes, np.asarray(res.steps.frame.payload)[det]))
    assert got == sorted(map(bytes, pays.reshape(-1, PAY)))
    d = np.asarray(res.carry.drift)
    want = _per_frame_drift(ppm)
    assert np.abs(d - want).max() < 1.5, (d, want)


@pytest.mark.parametrize("ppm", [500.0, -500.0])
def test_locked_steady_state_never_searches_under_drift(ppm, monkeypatch):
    """Warm-locked carry with a converged drift estimate: disable the
    acquisition search (its correlation patched to zeros, so any stream
    that fell back to search would MISS its frame) and require every
    frame to decode through the prediction probe alone — the 'no
    per-chunk search' guarantee at ±500 ppm."""
    import anet.stream as stream_mod

    rng = np.random.default_rng(7 + int(ppm > 0))
    cap, pays = _drifted_capture(rng, ppm)
    d0 = _per_frame_drift(ppm)
    carry = init_carry(CFG, CHUNK, PAY, (2,))
    carry = carry._replace(
        locked=jnp.ones((2,), jnp.bool_),
        next_start=jnp.full((2,), round(GAP0 / (1.0 + ppm * 1e-6)), jnp.int32),
        drift=jnp.full((2,), d0, jnp.float32),
    )

    def _dead_corr(seg, template, method=None):
        return jnp.zeros(seg.shape[:-1] + (seg.shape[-1] - template.shape[-1] + 1,))

    monkeypatch.setattr(stream_mod, "correlate_template", _dead_corr)
    res = receive_stream(CFG, cap, CHUNK, PAY, lock=True, carry=carry)
    assert int(res.carry.frames_ok.sum()) == 2 * N_FRAMES
    assert int(res.carry.decode_errors.sum()) == 0
    det = np.asarray(res.steps.detected)
    got = sorted(map(bytes, np.asarray(res.steps.frame.payload)[det]))
    assert got == sorted(map(bytes, pays.reshape(-1, PAY)))


@pytest.mark.parametrize("ppm", [500.0, -500.0])
def test_lock_merged_kernel_under_drift(ppm, interpret_tpu_kernels):
    """The merged probe+demod kernel path (TPU dispatch, interpret) under
    ±500 ppm decodes the same frames as the CPU jnp lock path — the
    drift-adjusted prediction and the EMA update are shared, but the
    kernel's servo/refine arithmetic is its own."""
    rng = np.random.default_rng(19)
    cap, pays = _drifted_capture(rng, ppm)
    cap16 = cap.astype(jnp.bfloat16)
    ref = receive_stream(CFG, cap16, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16)

    interpret_tpu_kernels()
    got = receive_stream(
        CFG, cap16, CHUNK, PAY, lock=True, compute_dtype=jnp.bfloat16,
        resident=False,
    )
    for res in (ref, got):
        assert int(res.carry.frames_ok.sum()) == 2 * N_FRAMES
        assert int(res.carry.decode_errors.sum()) == 0
    np.testing.assert_array_equal(
        np.asarray(ref.steps.detected), np.asarray(got.steps.detected)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.steps.frame_start), np.asarray(got.steps.frame_start)
    )
    np.testing.assert_allclose(
        np.asarray(ref.carry.drift), np.asarray(got.carry.drift), atol=1e-5
    )


def test_drift_checkpoint_roundtrip(tmp_path):
    """The drift estimate survives save/load; pre-drift checkpoints
    default to zero (bit-identical legacy behavior)."""
    carry = init_carry(CFG, CHUNK, PAY, (3,))
    carry = carry._replace(drift=jnp.asarray([1.5, -2.25, 0.0], jnp.float32))
    p = tmp_path / "c.npz"
    save_carry(p, carry)
    ck = load_carry(p)
    np.testing.assert_array_equal(np.asarray(ck.carry.drift), [1.5, -2.25, 0.0])

    # a checkpoint written without the field loads with drift == 0
    import numpy as _np

    with _np.load(p) as z:
        fields = {k: z[k] for k in z.files if k != "drift"}
    _np.savez_compressed(tmp_path / "old.npz", **fields)
    old = load_carry(tmp_path / "old.npz")
    np.testing.assert_array_equal(np.asarray(old.carry.drift), [0.0, 0.0, 0.0])


def test_gap_never_biases_drift():
    """A real TX pause (gap >> DRIFT_MAX_OBS) must not be mistaken for
    clock drift: after a gapped layout the estimate stays ~0."""
    rng = np.random.default_rng(11)
    tx = jax.jit(family.transmit_fn(CFG))
    pays = rng.integers(0, 256, (2, 3, PAY), dtype=np.uint8)
    waves = np.asarray(tx(jnp.asarray(pays.reshape(6, PAY)))).reshape(2, 3, T_FRAME)
    per = T_FRAME + 3000
    length = -(-(GAP0 + 3 * per + T_FRAME + CHUNK) // CHUNK) * CHUNK
    cap = np.zeros((2, length), np.float32)
    for i in range(3):
        cap[:, GAP0 + i * per : GAP0 + i * per + T_FRAME] = waves[:, i]
    cap += 0.02 * rng.standard_normal(cap.shape).astype(np.float32)
    res = receive_stream(CFG, jnp.asarray(cap), CHUNK, PAY, lock=True)
    assert int(res.carry.frames_ok.sum()) == 6
    assert np.abs(np.asarray(res.carry.drift)).max() < 0.01
