"""Demo: the full stack — Opus audio carried over the acoustic modem.

This composes every layer of the framework the way the north star
describes: real audio is Opus-encoded (the reference's codec), wrapped in
the reference's wire protocol (varint-delimited ToReceiver messages), and
then — where the reference hands bytes to TCP — modulated onto an OFDM
acoustic carrier, pushed through a noisy/echoey simulated room, recovered
by the streaming receiver, unwrapped, and Opus-decoded back to audio.

    WAV -> OpusEncoder -> ip.proto framing -> OFDM modulation
        -> channel (AWGN + echo) -> streaming receiver -> ip.proto parse
        -> OpusDecoder -> WAV

Run:  python examples/opus_over_sound.py [--snr 14] [--out received.wav]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # demo runs anywhere

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from anet.channel import ChannelConfig, apply_channel  # noqa: E402
from anet.codec import AudioFormat, OpusDecoder, OpusEncoder  # noqa: E402
from anet.dsp import ofdm  # noqa: E402
from anet.models import get_model  # noqa: E402
from anet.proto import AudioData, ToReceiver, encode_delimited  # noqa: E402
from anet.proto.framing import iter_delimited  # noqa: E402
from anet.stream import receive_stream  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--snr", type=float, default=14.0)
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--out", default=None, help="write recovered audio here")
    ap.add_argument("--model", default="ofdm-coded",
                    help="modem preset carrying the stream (e.g. ofdm-turbo)")
    args = ap.parse_args()

    # --- source audio: a little melody, Opus-encoded at 20 ms frames -------
    sr = 48_000
    t = np.arange(int(sr * args.seconds))
    melody = sum(
        0.2 * 32767 * np.sin(2 * np.pi * f * t / sr) * (np.sin(2 * np.pi * 2.0 * t / sr + p) > 0)
        for f, p in ((330, 0.0), (415, 2.1), (494, 4.2))
    ).astype(np.int16)
    stereo = np.repeat(melody, 2).tobytes()
    enc = OpusEncoder(AudioFormat(sr, 2), frame_duration_ms=20.0)
    opus_frames = enc.submit(stereo) + enc.final()
    print(f"source: {args.seconds:.1f} s of audio -> {len(opus_frames)} Opus frames "
          f"({sum(map(len, opus_frames))} bytes at {enc.bitrate_bps} bps)")

    # --- wire framing + modem transmit -------------------------------------
    cfg = get_model(args.model).config
    wire = [encode_delimited(ToReceiver(audio_data=AudioData(f)).encode())
            for f in opus_frames]
    frame_len = max(map(len, wire))
    padded = np.zeros((len(wire), frame_len), np.uint8)
    for i, w in enumerate(wire):
        padded[i, : len(w)] = np.frombuffer(w, np.uint8)
    waves = np.asarray(ofdm.transmit(cfg, jnp.asarray(padded)))
    gap = np.zeros(cfg.symbol_samples, np.float32)
    capture = np.concatenate(
        [np.zeros(1000, np.float32)] + [s for w in waves for s in (w, gap)]
    )
    chunk = 1024
    capture = np.concatenate([capture, np.zeros((-len(capture)) % chunk, np.float32)])
    air_seconds = len(capture) / cfg.sample_rate_hz
    print(f"modem: {len(wire)} PHY frames ({frame_len} B payloads) -> "
          f"{air_seconds:.1f} s on the air ({args.model})")

    # --- the room -----------------------------------------------------------
    dirty = apply_channel(
        jax.random.PRNGKey(0),
        jnp.asarray(capture),
        ChannelConfig(snr_db=args.snr, multipath_taps=(1.0, 0.0, 0.0, 0.25, 0.0, 0.1)),
    )
    print(f"channel: {args.snr} dB AWGN + two echoes")

    # --- streaming receive + unwrap + Opus decode ---------------------------
    res = receive_stream(cfg, dirty, chunk, frame_len)
    n_ok = int(res.carry.frames_ok)
    print(f"receiver: {n_ok}/{len(wire)} frames ok, "
          f"{int(res.carry.decode_errors)} decode errors")
    if n_ok != len(wire):
        print("FAILED: lost frames", file=sys.stderr)
        return 1
    ok_mask = np.asarray(res.steps.frame.ok)
    payloads = np.asarray(res.steps.frame.payload)
    dec = OpusDecoder()
    pcm = bytearray()
    recovered_frames = 0
    for i in np.nonzero(ok_mask)[0]:
        inner = next(iter_delimited(bytes(payloads[i])))
        frame = ToReceiver.decode(inner).audio_data.opus_encoded_frame
        pcm += dec.decode(frame)
        recovered_frames += 1
    x = np.frombuffer(bytes(pcm), np.int16).astype(np.float64)
    rms = float(np.sqrt(np.mean(x**2)))
    print(f"decoded: {recovered_frames} Opus frames -> "
          f"{len(pcm)} PCM bytes ({len(pcm)/4/sr:.2f} s), rms={rms:.0f}")
    if args.out:
        import wave

        with wave.open(args.out, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(bytes(pcm))
        print(f"wrote {args.out}")
    ok = recovered_frames == len(opus_frames) and rms > 1000
    print("full stack roundtrip:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
