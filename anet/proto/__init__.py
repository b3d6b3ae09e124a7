"""The ip.proto wire contract, implemented from scratch in pure Python.

Wire-compatible with both reference codecs: protobuf-java's
``writeDelimitedTo`` (transmitter side) and nanopb's ``pb_decode_delimited``
(receiver firmware side). Schema source: /root/reference/protocol/ip.proto.
"""

from anet.proto.messages import (
    AudioData,
    BroadcastMessage,
    DiscoveryResponse,
    ReceiverError,
    ReceiverInformation,
    ToReceiver,
    ToTransmitter,
)
from anet.proto.framing import (
    DelimitedDecoder,
    encode_delimited,
    read_delimited,
    write_delimited,
)
from anet.proto.wire import WireError, decode_varint, encode_varint

__all__ = [
    "AudioData",
    "BroadcastMessage",
    "DiscoveryResponse",
    "ReceiverError",
    "ReceiverInformation",
    "ToReceiver",
    "ToTransmitter",
    "DelimitedDecoder",
    "encode_delimited",
    "read_delimited",
    "write_delimited",
    "WireError",
    "decode_varint",
    "encode_varint",
]
