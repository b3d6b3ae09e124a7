"""Demo: adaptive modulation — probe the channel, pick the preset, transfer.

The link-adaptation loop the reference's README promises ("react to
receiver quality feedback") taken to its modem conclusion:

  1. PROBE   — send one frame on the most robust preset (fsk2-robust);
               any channel that works at all decodes it.
  2. MEASURE — normalize the probe's demod SNR estimate to waveform scale
               (anet.dsp.family.waveform_snr_db).
  3. ADAPT   — suggest_model() picks the fastest preset whose measured
               operating threshold fits, with a safety margin.
  4. TRANSFER— send the bulk payload on the chosen preset and verify it
               decodes byte-identically.

Run:  python examples/adaptive_modem.py [--snr 9] [--bytes 600]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # demo runs anywhere

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from anet.channel import awgn  # noqa: E402
from anet.dsp.family import (  # noqa: E402
    aligned_demod_fn,
    frame_samples,
    transmit_fn,
    waveform_snr_db,
)
from anet.dsp.pipeline import receive_frame  # noqa: E402
from anet.models import (  # noqa: E402
    get_model,
    net_bit_rate_bps,
    suggest_model,
)
from anet.stream import receive_stream  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--snr", type=float, default=9.0, help="true channel SNR (dB)")
    ap.add_argument("--bytes", type=int, default=600, help="bulk payload size")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.bytes < 1:
        ap.error("--bytes must be >= 1")
    key = jax.random.PRNGKey(args.seed)

    # --- 1. probe on the most robust preset --------------------------------
    probe_model = get_model("fsk2-robust")
    probe_payload = jnp.asarray(np.arange(16, dtype=np.uint8))
    probe_wave = transmit_fn(probe_model.config)(probe_payload)
    dirty_probe = awgn(key, jnp.concatenate([jnp.zeros(500), probe_wave, jnp.zeros(500)]), args.snr)
    probe_rx = receive_frame(probe_model.config, dirty_probe, 16)
    if not bool(probe_rx.frame.ok):
        print(f"probe failed at {args.snr} dB — channel unusable", file=sys.stderr)
        return 1
    print(f"probe: {probe_model.name} decoded ok "
          f"(air rate {probe_model.config.bit_rate_bps:.0f} bps)")

    # --- 2. measure ----------------------------------------------------------
    measured = float(waveform_snr_db(probe_model.config, probe_rx.frame.snr_db))
    print(f"measure: waveform snr ~ {measured:.1f} dB (true: {args.snr:.1f} dB)")

    # --- 3. adapt ------------------------------------------------------------
    chosen = suggest_model(measured)
    speedup = net_bit_rate_bps(chosen) / net_bit_rate_bps(probe_model)
    print(f"adapt: {chosen.name} ({net_bit_rate_bps(chosen):.0f} bps net, "
          f"{speedup:.0f}x the probe rate)")

    # --- 4. transfer -----------------------------------------------------------
    rng = np.random.default_rng(args.seed)
    payload = rng.integers(0, 256, args.bytes, dtype=np.uint8)
    cfg = chosen.config
    # frame the bulk payload in <=256-byte PHY frames
    per = 256
    frames = [payload[i : i + per] for i in range(0, len(payload), per)]
    tx = transmit_fn(cfg)
    gap = np.zeros(400, np.float32)
    parts = [np.zeros(800, np.float32)]
    for f in frames:
        pad = np.zeros(per - len(f), np.uint8)
        parts += [np.asarray(tx(jnp.asarray(np.concatenate([f, pad])))), gap]
    chunk = 1024
    cap = np.concatenate(parts + [np.zeros(frame_samples(cfg, per), np.float32)])
    cap = np.concatenate([cap, np.zeros((-len(cap)) % chunk, np.float32)])
    dirty = awgn(jax.random.PRNGKey(args.seed + 1), jnp.asarray(cap), args.snr)
    t0 = time.perf_counter()
    res = receive_stream(cfg, dirty, chunk, per)
    n_ok = int(res.carry.frames_ok)
    dt = time.perf_counter() - t0
    air_s = len(cap) / cfg.sample_rate_hz
    print(f"transfer: {n_ok}/{len(frames)} frames ok over a {args.snr} dB channel "
          f"({air_s:.1f} s on the air, decoded in {dt:.1f} s)")
    if n_ok != len(frames):
        print("FAILED: lost frames — threshold margin too thin?", file=sys.stderr)
        return 1
    got = np.concatenate(
        [np.asarray(p) for p, d in zip(res.steps.frame.payload, np.asarray(res.steps.detected)) if d]
    )[: len(payload)]
    ok = np.array_equal(got, payload)
    print("adaptive transfer:", "OK (byte-identical)" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
