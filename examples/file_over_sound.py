"""Demo: send a file through the acoustic modem, end to end.

Splits a file into wire-framed chunks (varint-delimited ToReceiver/AudioData
— the exact bytes the reference system puts on TCP), modulates each as one
PHY frame into a single audio capture, pushes the capture through a rough
simulated channel, then recovers every file chunk with the streaming
receiver and reassembles the file byte-identically.

Run:  python examples/file_over_sound.py [path] [--snr 8] [--model mfsk16-fast]
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
from anet.dsp.pipeline import transmit  # noqa: E402
from anet.models import get_model  # noqa: E402
from anet.proto import AudioData, ToReceiver, encode_delimited  # noqa: E402
from anet.proto.framing import iter_delimited  # noqa: E402
from anet.stream import receive_stream  # noqa: E402

CHUNK_PAYLOAD = 256  # file bytes per PHY frame (wire framing adds a few)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", nargs="?", default=__file__)
    ap.add_argument("--snr", type=float, default=8.0)
    ap.add_argument("--model", default="mfsk16-fast")
    args = ap.parse_args()

    cfg = get_model(args.model).config
    data = open(args.path, "rb").read()
    if not data:
        print("input file is empty; nothing to send")
        return 0
    chunks = [data[i : i + CHUNK_PAYLOAD] for i in range(0, len(data), CHUNK_PAYLOAD)]
    # Wire-frame each chunk exactly like the reference transport would.
    payloads = [
        encode_delimited(ToReceiver(audio_data=AudioData(c)).encode()) for c in chunks
    ]
    # Pad the last payload to the common frame size (static shapes).
    frame_len = max(len(p) for p in payloads)
    padded = np.zeros((len(payloads), frame_len), np.uint8)
    for i, p in enumerate(payloads):
        padded[i, : len(p)] = np.frombuffer(p, np.uint8)

    waves = np.asarray(transmit(cfg, jnp.asarray(padded)))
    gap = np.zeros(cfg.samples_per_symbol * 8, np.float32)
    capture = np.concatenate(
        sum(([w.astype(np.float32), gap] for w in waves), [np.zeros(1000, np.float32)])
    )
    chunk_size = 1024
    capture = np.concatenate(
        [capture, np.zeros((-len(capture)) % chunk_size, np.float32)]
    )
    seconds = len(capture) / cfg.sample_rate_hz
    print(
        f"{len(data)} bytes -> {len(payloads)} PHY frames -> "
        f"{len(capture)} samples ({seconds:.1f} s of audio at "
        f"{cfg.sample_rate_hz} Hz, {get_model(args.model).name})"
    )

    dirty = apply_channel(
        jax.random.PRNGKey(0),
        jnp.asarray(capture),
        ChannelConfig(snr_db=args.snr, multipath_taps=(1.0, 0.0, 0.25)),
    )
    print(f"channel: {args.snr} dB AWGN + echo")

    res = receive_stream(cfg, dirty, chunk_size, frame_len)
    n_ok = int(res.carry.frames_ok)
    print(
        f"receiver: {int(res.carry.frames_detected)} frames detected, "
        f"{n_ok} ok, {int(res.carry.decode_errors)} decode errors"
    )
    if n_ok != len(payloads):
        print("FAILED: not all frames recovered", file=sys.stderr)
        return 1

    ok_mask = np.asarray(res.steps.frame.ok)  # only integrity-verified frames
    all_payloads = np.asarray(res.steps.frame.payload)
    recovered = bytearray()
    for i in np.nonzero(ok_mask)[0]:
        raw = bytes(all_payloads[i])
        inner = next(iter_delimited(raw))  # strips the length prefix + pad
        recovered += ToReceiver.decode(inner).audio_data.opus_encoded_frame
    ok = bytes(recovered) == data
    print("file reassembled byte-identical:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
