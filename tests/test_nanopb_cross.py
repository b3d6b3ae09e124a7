"""Cross-validation against the reference receiver's REAL protobuf codec.

SURVEY.md §7.3 demands golden validation against both reference
implementations. tests/test_proto_wire.py covers google.protobuf (the
transmitter side's codec family); this file covers nanopb 0.4.5 + the
generated ip.pb.c — the exact code a reference receiver runs
(hardware/src/network.cpp:411 pb_decode_delimited, :475 pb_decode) —
via the C harness in tools/nanopb_harness (compiled out of the
reference tree; skipped when the tree or toolchain is absent).

Golden vectors emitted by the real nanopb encoder are committed in
tests/golden/, so the anet-decodes-nanopb direction runs on every CI
box even without the reference tree.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

import pytest

from anet import constants
from anet.proto.framing import encode_delimited, iter_delimited
from anet.proto.messages import (
    AudioData,
    BroadcastMessage,
    DiscoveryResponse,
    ReceiverError,
    ReceiverInformation,
    ToReceiver,
    ToTransmitter,
    WireError,
)

REPO = pathlib.Path(__file__).resolve().parent.parent
HARNESS_DIR = REPO / "tools" / "nanopb_harness"
HARNESS = HARNESS_DIR / "build" / "nanopb_harness"
GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"

DISCOVERY = DiscoveryResponse(
    protocol_version=1,
    mac_address=0xAABBCCDDEEFF,
    device_name="anet cross-validation receiver",
    currently_streaming=False,
    opus_version="libopus 1.3.1",
)
HELLO = ToTransmitter(
    receiver_information=ReceiverInformation(
        discovery_data=DISCOVERY,
        max_encoded_frame_size=constants.MAX_ENCODED_FRAME_SIZE,
        max_decoded_frame_size=constants.MAX_DECODED_FRAME_SIZE,
    )
)


@pytest.fixture(scope="session")
def harness():
    """Build (idempotent) and return the harness path, or skip."""
    if not pathlib.Path("/root/reference/hardware/lib/nanopb/src/pb_decode.c").exists():
        pytest.skip("reference tree not available")
    if shutil.which("cc") is None and shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    build = subprocess.run(
        ["make", "-C", str(HARNESS_DIR)], capture_output=True, text=True
    )
    if build.returncode != 0 or not HARNESS.exists():
        pytest.skip(f"harness build failed: {build.stderr[-300:]}")
    return HARNESS


def run_harness(path, mode, *args, stdin=b""):
    out = subprocess.run(
        [str(path), mode, *args], input=stdin, capture_output=True, timeout=30
    )
    assert out.returncode == 0, out.stderr.decode()
    return out.stdout


# --- anet bytes -> real nanopb ------------------------------------------------


def test_nanopb_decodes_anet_audio_stream(harness):
    """Frame-for-frame: anet-emitted delimited ToReceiver messages decode
    in the loop a real receiver runs (network.cpp:409-430)."""
    frames = [bytes([i % 256] * n) for i, n in enumerate([1, 57, 1275, 4096])]
    stream = b"".join(
        encode_delimited(ToReceiver(audio_data=AudioData(f)).encode()) for f in frames
    )
    lines = run_harness(harness, "decode-toreceiver", stdin=stream).decode().splitlines()
    assert lines[-1] == f"eof frames={len(frames)}"
    for f, line in zip(frames, lines):
        assert line == f"frame len={len(f)} data={f.hex()}"


def test_nanopb_enforces_frame_cap_on_anet_bytes(harness):
    """A frame over MAX_ENCODED_FRAME_SIZE kills the connection mid-stream
    (network.cpp:24,223) — frames before it decode, the oversize errors."""
    ok = encode_delimited(ToReceiver(audio_data=AudioData(b"x" * 100)).encode())
    # anet refuses to BUILD an oversize frame (part of the same contract),
    # so craft the raw bytes by hand
    from anet.proto import wire

    oversize = wire.encode_len_field(1, wire.encode_len_field(1, b"z" * 4097))
    stream = ok + encode_delimited(oversize)
    out = run_harness(harness, "decode-toreceiver", stdin=stream).decode()
    lines = out.splitlines()
    assert lines[0].startswith("frame len=100")
    # nanopb reports the cap rejection as "callback failed" (the callback's
    # own errmsg is dropped on the early-return path, pb_decode.c
    # decode_callback_field) — the contract is that the frame is REFUSED
    # and the connection dies, which the firmware logs the same way.
    assert lines[1].startswith("error frames=1")


def test_nanopb_decodes_anet_hello_and_error(harness):
    out = run_harness(
        harness,
        "decode-totransmitter",
        stdin=encode_delimited(HELLO.encode())
        + encode_delimited(ToTransmitter(error=ReceiverError(True, False)).encode()),
    ).decode()
    lines = out.splitlines()
    assert lines[0] == (
        "receiver_information protocol_version=1 mac=187723572702975 "
        "name=anet cross-validation receiver streaming=0 "
        "opus=libopus 1.3.1 max_enc=4096 max_dec=11520"
    )
    assert lines[1] == "receiver_error underflow=1 decode_error=0"
    assert lines[2] == "eof msgs=2"


def test_nanopb_rejects_128_byte_string(harness):
    """nanopb's max_size:128 includes the NUL: a 128-byte device name is
    'string overflow' to the real codec (pb_decode.c pb_dec_string), so
    anet caps at 127 — and a hand-crafted 128-byte one must fail."""
    from anet.proto import wire

    with pytest.raises(WireError):
        DiscoveryResponse(1, 0, "x" * 128, False, "v").encode()
    body = (
        wire.encode_varint_field(1, 1)
        + wire.encode_varint_field(2, 0)
        + wire.encode_len_field(3, b"x" * 128)
        + wire.encode_varint_field(4, 0)
        + wire.encode_len_field(5, b"v")
    )
    hello = wire.encode_len_field(
        1,
        wire.encode_len_field(1, body)
        + wire.encode_varint_field(2, 4096)
        + wire.encode_varint_field(3, 11520),
    )
    out = run_harness(harness, "decode-totransmitter", stdin=encode_delimited(hello))
    assert b"string overflow" in out
    # the 127-byte maximum passes both codecs
    ok = ToTransmitter(
        receiver_information=ReceiverInformation(
            DiscoveryResponse(1, 0, "n" * 127, False, "v"), 1, 1
        )
    )
    out = run_harness(
        harness, "decode-totransmitter", stdin=encode_delimited(ok.encode())
    ).decode()
    assert "name=" + "n" * 127 in out


def test_nanopb_decodes_anet_broadcast(harness):
    req = BroadcastMessage(magic_word=constants.MAGIC_WORD, discovery_request=True)
    out = run_harness(harness, "decode-broadcast", stdin=req.encode()).decode()
    assert out.startswith("magic=2c5da044 which=2 request=1")
    resp = BroadcastMessage(
        magic_word=constants.MAGIC_WORD, discovery_response=DISCOVERY
    )
    out = run_harness(harness, "decode-broadcast", stdin=resp.encode()).decode()
    assert "name=anet cross-validation receiver" in out
    assert "mac=187723572702975" in out


# --- real nanopb bytes -> anet ------------------------------------------------


def test_anet_decodes_nanopb_hello(harness):
    data = run_harness(
        harness,
        "encode-hello",
        "1",
        str(0xAABBCCDDEEFF),
        "esp32 loudspeaker",
        "0",
        "libopus 1.3.1",
        "4096",
        "11520",
    )
    payloads = list(iter_delimited(data))
    assert len(payloads) == 1
    msg = ToTransmitter.decode(payloads[0])
    ri = msg.receiver_information
    assert ri is not None
    assert ri.discovery_data.device_name == "esp32 loudspeaker"
    assert ri.discovery_data.mac_address == 0xAABBCCDDEEFF
    assert ri.max_encoded_frame_size == 4096
    assert ri.max_decoded_frame_size == 11520


def test_anet_decodes_nanopb_audio_and_error(harness):
    frames = [b"\x00", b"opus" * 300, b"q" * 4096]
    stdin = b"".join(len(f).to_bytes(4, "big") + f for f in frames)
    data = run_harness(harness, "encode-audio", stdin=stdin)
    decoded = [ToReceiver.decode(p).audio_data.opus_encoded_frame
               for p in iter_delimited(data)]
    assert decoded == frames

    err = run_harness(harness, "encode-error", "0", "1")
    msg = ToTransmitter.decode(next(iter(iter_delimited(err))))
    assert msg.error == ReceiverError(audio_underflow=False, audio_decode_error=True)


def test_anet_decodes_nanopb_broadcast(harness):
    req = run_harness(harness, "encode-broadcast-request")
    msg = BroadcastMessage.decode(req)
    assert msg.magic_word == constants.MAGIC_WORD and msg.discovery_request
    resp = run_harness(
        harness, "encode-broadcast-response", "1", "42", "dev", "1", "opus"
    )
    msg = BroadcastMessage.decode(resp)
    assert msg.discovery_response.device_name == "dev"
    assert msg.discovery_response.currently_streaming is True


# --- committed golden vectors (run everywhere) --------------------------------


def test_golden_nanopb_vectors_decode():
    """Bytes emitted by the real nanopb encoder (checked in; regenerate
    with tools/nanopb_harness/gen_goldens.sh) parse in anet."""
    hello = (GOLDEN / "nanopb_hello.bin").read_bytes()
    msg = ToTransmitter.decode(next(iter(iter_delimited(hello))))
    assert msg.receiver_information.discovery_data.device_name == "esp32 loudspeaker"
    assert msg.receiver_information.max_encoded_frame_size == 4096

    audio = (GOLDEN / "nanopb_audio.bin").read_bytes()
    frames = [ToReceiver.decode(p).audio_data.opus_encoded_frame
              for p in iter_delimited(audio)]
    assert [len(f) for f in frames] == [1, 1200, 4096]

    bc = (GOLDEN / "nanopb_broadcast_response.bin").read_bytes()
    msg = BroadcastMessage.decode(bc)
    assert msg.magic_word == constants.MAGIC_WORD
    assert msg.discovery_response.device_name == "esp32 loudspeaker"
