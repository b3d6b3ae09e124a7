"""Golden wire-compat tests for anet.proto.

Strategy (SURVEY.md §4): the reference has two independent codec
implementations (protobuf-java and nanopb) that must agree; here we
cross-validate anet's hand-written codec against a third independent
implementation — the stock google.protobuf runtime — via the generated
fixture in tests/golden/ (regen: ``protoc --python_out=. anet_testschema.proto``).
Any byte stream anet emits must parse identically with google.protobuf, and
vice versa.
"""

import io
import sys
from pathlib import Path

import pytest

from anet import constants
from anet.proto import (
    AudioData,
    BroadcastMessage,
    DelimitedDecoder,
    DiscoveryResponse,
    ReceiverError,
    ReceiverInformation,
    ToReceiver,
    ToTransmitter,
    WireError,
    decode_varint,
    encode_delimited,
    encode_varint,
    read_delimited,
    write_delimited,
)
from anet.proto.framing import iter_delimited

sys.path.insert(0, str(Path(__file__).parent / "golden"))
import anet_testschema_pb2 as pb  # noqa: E402


def ref_discovery() -> DiscoveryResponse:
    return DiscoveryResponse(
        protocol_version=constants.PROTOCOL_VERSION,
        mac_address=0xA1B2C3D4E5F6,
        device_name="living-room",
        currently_streaming=False,
        opus_version="libopus 1.3.1",
    )


def pb_discovery() -> "pb.DiscoveryResponse":
    return pb.DiscoveryResponse(
        protocol_version=constants.PROTOCOL_VERSION,
        mac_address=0xA1B2C3D4E5F6,
        device_name="living-room",
        currently_streaming=False,
        opus_version="libopus 1.3.1",
    )


# --- varints -----------------------------------------------------------------

@pytest.mark.parametrize(
    "value,expected",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),
        (constants.MAGIC_WORD, bytes.fromhex("c4c0f6e202")),
        ((1 << 64) - 1, b"\xff" * 9 + b"\x01"),
    ],
)
def test_varint_roundtrip(value, expected):
    assert encode_varint(value) == expected
    decoded, pos = decode_varint(expected)
    assert decoded == value and pos == len(expected)


def test_varint_rejects_overlong():
    with pytest.raises(WireError):
        decode_varint(b"\x80" * 11)
    with pytest.raises(WireError):
        decode_varint(b"\x80\x80")  # truncated


# --- message byte-compat vs google.protobuf ----------------------------------

def test_broadcast_request_bytes_match_protobuf():
    ours = BroadcastMessage(constants.MAGIC_WORD, discovery_request=True)
    theirs = pb.BroadcastMessage(magic_word=constants.MAGIC_WORD, discovery_request=True)
    assert ours.encode() == theirs.SerializeToString()
    # decode their bytes with our codec
    back = BroadcastMessage.decode(theirs.SerializeToString())
    assert back.has_valid_magic and back.discovery_request is True
    assert back.discovery_response is None


def test_discovery_response_bytes_match_protobuf():
    assert ref_discovery().encode() == pb_discovery().SerializeToString()
    back = DiscoveryResponse.decode(pb_discovery().SerializeToString())
    assert back == ref_discovery()


def test_broadcast_response_nested():
    ours = BroadcastMessage(constants.MAGIC_WORD, discovery_response=ref_discovery())
    theirs = pb.BroadcastMessage(magic_word=constants.MAGIC_WORD)
    theirs.discovery_response.CopyFrom(pb_discovery())
    assert ours.encode() == theirs.SerializeToString()
    assert BroadcastMessage.decode(ours.encode()).discovery_response == ref_discovery()


def test_receiver_information_hello_bytes():
    """The firmware hello (network.cpp:380-404): caps 4096/11520."""
    ours = ToTransmitter(
        receiver_information=ReceiverInformation(
            discovery_data=ref_discovery(),
            max_encoded_frame_size=constants.MAX_ENCODED_FRAME_SIZE,
            max_decoded_frame_size=constants.MAX_DECODED_FRAME_SIZE,
        )
    )
    theirs = pb.ToTransmitter()
    theirs.receiver_information.discovery_data.CopyFrom(pb_discovery())
    theirs.receiver_information.max_encoded_frame_size = constants.MAX_ENCODED_FRAME_SIZE
    theirs.receiver_information.max_decoded_frame_size = constants.MAX_DECODED_FRAME_SIZE
    assert ours.encode() == theirs.SerializeToString()
    back = ToTransmitter.decode(theirs.SerializeToString())
    assert back.receiver_information.max_encoded_frame_size == 4096
    assert back.receiver_information.max_decoded_frame_size == 11520


def test_receiver_error_bytes():
    ours = ToTransmitter(error=ReceiverError(audio_underflow=True, audio_decode_error=False))
    theirs = pb.ToTransmitter()
    theirs.error.audio_underflow = True
    theirs.error.audio_decode_error = False
    assert ours.encode() == theirs.SerializeToString()
    assert ToTransmitter.decode(ours.encode()).error.audio_underflow is True


def test_audio_frame_bytes():
    payload = bytes(range(256)) * 4
    ours = ToReceiver(audio_data=AudioData(payload))
    theirs = pb.ToReceiver()
    theirs.audio_data.opus_encoded_frame = payload
    assert ours.encode() == theirs.SerializeToString()
    assert ToReceiver.decode(theirs.SerializeToString()).audio_data.opus_encoded_frame == payload


# --- proto2 strictness -------------------------------------------------------

def test_required_field_missing_raises():
    with pytest.raises(WireError, match="magic_word"):
        BroadcastMessage.decode(b"")
    with pytest.raises(WireError, match="protocol_version"):
        DiscoveryResponse.decode(b"")


def test_oneof_double_set_rejected():
    with pytest.raises(WireError, match="oneof"):
        BroadcastMessage(
            constants.MAGIC_WORD, discovery_request=True, discovery_response=ref_discovery()
        )


def test_oneof_last_wins_on_decode():
    # request followed by response on the wire: response wins (merge semantics)
    data = (
        BroadcastMessage(constants.MAGIC_WORD, discovery_request=True).encode()
        + BroadcastMessage(0, discovery_response=ref_discovery()).encode()[2:]
    )
    # construct manually: magic + request field + response field
    from anet.proto import wire as w

    data = (
        w.encode_varint_field(1, constants.MAGIC_WORD)
        + w.encode_varint_field(2, 1)
        + w.encode_len_field(3, ref_discovery().encode())
    )
    msg = BroadcastMessage.decode(data)
    assert msg.discovery_request is None
    assert msg.discovery_response == ref_discovery()


def test_frame_cap_enforced_like_firmware():
    """The firmware rejects frames > 4096 bytes (network.cpp:24,223)."""
    big = ToReceiver(audio_data=AudioData(b"\x00" * 4097)).encode()
    with pytest.raises(WireError, match="exceeds cap"):
        ToReceiver.decode(big)
    ok = ToReceiver(audio_data=AudioData(b"\x00" * 4096)).encode()
    assert len(ToReceiver.decode(ok).audio_data.opus_encoded_frame) == 4096


def test_nanopb_string_cap_enforced_on_encode():
    """device_name/opus_version capped at 127 usable bytes: nanopb's
    max_size:128 (protobuf_ip.options:1-2) includes the NUL terminator —
    the real pb_decode rejects a 128-byte string with "string overflow"
    (verified against the actual codec in tests/test_nanopb_cross.py)."""
    with pytest.raises(WireError, match="nanopb cap"):
        DiscoveryResponse(1, 0, "x" * 128, False, "v").encode()
    DiscoveryResponse(1, 0, "x" * 127, False, "v").encode()  # max passes


def test_unknown_fields_skipped():
    from anet.proto import wire as w

    data = ref_discovery().encode() + w.encode_varint_field(99, 7) + w.encode_len_field(100, b"zz")
    assert DiscoveryResponse.decode(data) == ref_discovery()


# --- delimited framing -------------------------------------------------------

def test_delimited_matches_protobuf_java_writeDelimitedTo():
    """google.protobuf's SerializeDelimited* shares the varint-prefix format
    with protobuf-java writeDelimitedTo (AsyncProtobufTest.kt:39 pattern)."""
    from google.protobuf.internal.encoder import _VarintBytes

    msg = pb_discovery()
    java_style = _VarintBytes(msg.ByteSize()) + msg.SerializeToString()
    assert encode_delimited(ref_discovery().encode()) == java_style


def test_delimited_stream_roundtrip():
    buf = io.BytesIO()
    frames = [b"", b"a", b"hello world", bytes(300)]
    for f in frames:
        write_delimited(buf, f)
    buf.seek(0)
    out = []
    while (f := read_delimited(buf)) is not None:
        out.append(f)
    assert out == frames


def test_delimited_truncation_detected():
    data = encode_delimited(b"hello")[:-2]
    buf = io.BytesIO(data)
    with pytest.raises(WireError):
        read_delimited(buf)


def test_incremental_decoder_fragmented_feed():
    """Framing state must survive arbitrary fragmentation — the same property
    the firmware's recv-backed pb_istream has (network.cpp:262-305)."""
    stream = b"".join(
        encode_delimited(ToReceiver(audio_data=AudioData(bytes([i]) * (i + 1))).encode())
        for i in range(20)
    )
    for chunk_size in (1, 2, 3, 7, 64, len(stream)):
        dec = DelimitedDecoder()
        frames = []
        for i in range(0, len(stream), chunk_size):
            frames += dec.feed(stream[i : i + chunk_size])
        assert len(frames) == 20
        assert dec.pending_bytes == 0
        for i, frame in enumerate(frames):
            assert ToReceiver.decode(frame).audio_data.opus_encoded_frame == bytes([i]) * (i + 1)


def test_decoder_rejects_oversized_frame():
    dec = DelimitedDecoder(max_bytes=10)
    with pytest.raises(WireError, match="exceeds cap"):
        dec.feed(encode_varint(11))


def test_iter_delimited():
    data = encode_delimited(b"a") + encode_delimited(b"bc")
    assert list(iter_delimited(data)) == [b"a", b"bc"]


# --- asyncio framing ---------------------------------------------------------

def test_asyncio_delimited_roundtrip():
    """The protobuf_async.kt analog: coroutine read/write of delimited
    messages over an in-memory asyncio transport (the fake-channel test
    pattern from AsyncProtobufTest.kt:53)."""
    import asyncio

    from anet.proto.framing import (
        read_delimited_async,
        read_delimited_message,
        write_delimited_async,
    )

    async def scenario():
        reader = asyncio.StreamReader()
        # loop the bytes straight back into the reader
        class Loopback:
            def write(self, data):
                reader.feed_data(data)

        writer = Loopback()
        hello = ToTransmitter(
            receiver_information=ReceiverInformation(
                discovery_data=ref_discovery(),
                max_encoded_frame_size=4096,
                max_decoded_frame_size=11520,
            )
        )
        write_delimited_async(writer, hello.encode())
        for i in range(5):
            write_delimited_async(
                writer, ToReceiver(audio_data=AudioData(bytes([i]) * 99)).encode()
            )
        reader.feed_eof()
        first = await read_delimited_message(reader, ToTransmitter.decode)
        assert first.receiver_information.max_encoded_frame_size == 4096
        frames = []
        while (raw := await read_delimited_async(reader)) is not None:
            frames.append(ToReceiver.decode(raw).audio_data.opus_encoded_frame)
        assert frames == [bytes([i]) * 99 for i in range(5)]
        # clean EOF at a boundary -> None
        assert await read_delimited_async(reader) is None

    asyncio.run(scenario())


def test_asyncio_truncated_stream_raises():
    import asyncio

    from anet.proto.framing import read_delimited_async

    async def scenario():
        reader = asyncio.StreamReader()
        reader.feed_data(encode_delimited(b"hello world")[:-3])
        reader.feed_eof()
        with pytest.raises(WireError, match="EOF inside"):
            await read_delimited_async(reader)

    asyncio.run(scenario())


# --- robustness: arbitrary bytes never crash the codec -----------------------

def test_decoder_never_crashes_on_random_bytes():
    """Every decode path must raise WireError (or succeed) on arbitrary
    input — never UnicodeDecodeError, IndexError, or similar. The host edge
    feeds these decoders raw LAN datagrams."""
    import random

    rng = random.Random(0xA044)
    decoders = [
        BroadcastMessage.decode,
        DiscoveryResponse.decode,
        ToReceiver.decode,
        ToTransmitter.decode,
        AudioData.decode,
        ReceiverError.decode,
    ]
    corpus = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 80)))
              for _ in range(300)]
    # plus mutated valid messages (bit flips in real encodings)
    valid = BroadcastMessage(
        constants.MAGIC_WORD, discovery_response=ref_discovery()
    ).encode()
    for _ in range(200):
        b = bytearray(valid)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        corpus.append(bytes(b))
    for data in corpus:
        for dec in decoders:
            try:
                dec(data)
            except WireError:
                pass  # the one sanctioned failure mode


def test_framer_never_crashes_on_random_streams():
    import random

    rng = random.Random(7)
    for _ in range(50):
        dec = DelimitedDecoder(max_bytes=4096)
        stream = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
        try:
            for i in range(0, len(stream), 13):
                dec.feed(stream[i : i + 13])
        except WireError:
            pass
