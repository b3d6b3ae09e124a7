"""Host networking tests: native core, discovery, sessions, recovery."""

import socket
import threading
import time

import pytest

from anet import constants
from anet.net import native
from anet.net.discovery import DiscoveryResponder, discover_receivers
from anet.net.reconnect import ReconnectPolicy
from anet.net.server import AudioStreamServer
from anet.net.session import RemoteAudioReceiver, SessionError
from anet.proto import (
    ToTransmitter,
    AudioData,
    BroadcastMessage,
    DiscoveryResponse,
    ToReceiver,
    encode_delimited,
)
from anet.proto.framing import DelimitedDecoder
from anet.proto.wire import WireError

TEST_UDP_PORT = 48765  # avoid colliding with a real receiver on 58765

needs_native = pytest.mark.skipif(
    not native.available(), reason="libanet_net.so not built"
)


def ident(name="test-rx"):
    return DiscoveryResponse(1, 0x0200DEADBEEF, name, False, "libopus 1.3.1")


# --- native core -------------------------------------------------------------

@needs_native
def test_native_framer_matches_python_decoder():
    frames_in = [bytes([i]) * (1 + i * 31 % 900) for i in range(40)]
    stream = b"".join(encode_delimited(f) for f in frames_in)
    for chunk in (1, 3, 17, 1000, len(stream)):
        nf = native.NativeFramer()
        pf = DelimitedDecoder()
        got_n, got_p = [], []
        for i in range(0, len(stream), chunk):
            piece = stream[i : i + chunk]
            got_n += nf.feed(piece)
            got_p += pf.feed(piece)
        assert got_n == got_p == frames_in
        assert nf.pending_bytes == 0


@needs_native
def test_native_framer_rejects_corrupt_stream():
    nf = native.NativeFramer(max_frame=100)
    with pytest.raises(WireError):
        nf.feed(b"\xff" * 64)  # huge length prefix


@pytest.mark.parametrize(
    "ip,mask,expected",
    [
        # the firmware's own on-device test vectors (test/network.cpp:5-43)
        ("192.168.178.21", "255.255.255.0", "192.168.178.255"),
        ("172.16.5.9", "255.255.0.0", "172.16.255.255"),
        ("10.1.2.3", "255.0.0.0", "10.255.255.255"),
        ("192.168.160.1", "255.255.224.0", "192.168.191.255"),
    ],
)
def test_broadcast_address_math(ip, mask, expected):
    assert native.broadcast_address(ip, mask) == expected


def test_list_interfaces_native_and_fallback_agree():
    """Both enumeration paths (getifaddrs in the C++ core, ioctl fallback)
    must report the same up/broadcast/non-loopback IPv4 interfaces."""
    native_list = native.list_interfaces()
    saved = native._lib, native._load_failed
    try:
        native._lib, native._load_failed = None, True
        fallback_list = native.list_interfaces()
    finally:
        native._lib, native._load_failed = saved
    if native.available():
        assert sorted(native_list) == sorted(fallback_list)
    for addr, mask in native_list:
        assert not addr.startswith("127.")
        # the netmask parses and produces a directed broadcast
        assert native.broadcast_address(addr, mask)


def test_broadcast_targets_multihomed_non24():
    """A multi-homed host with non-/24 masks probes every interface's REAL
    directed broadcast (discovery.kt:33-40) — the old behavior guessed a
    single /24 from gethostbyname and missed receivers on a /16 LAN."""
    from anet.net.discovery import _broadcast_targets

    targets = _broadcast_targets(
        [("10.2.3.4", "255.255.0.0"), ("192.168.160.1", "255.255.224.0")]
    )
    assert "10.2.255.255" in targets  # /16 directed broadcast, not 10.2.3.255
    assert "192.168.191.255" in targets  # /19
    assert "255.255.255.255" in targets  # limited broadcast always included


def test_validate_discovery_request():
    good = BroadcastMessage(constants.MAGIC_WORD, discovery_request=True).encode()
    assert native.validate_discovery_request(good, constants.MAGIC_WORD)
    bad_magic = BroadcastMessage(0x123, discovery_request=True).encode()
    assert not native.validate_discovery_request(bad_magic, constants.MAGIC_WORD)
    response = BroadcastMessage(
        constants.MAGIC_WORD, discovery_response=ident()
    ).encode()
    assert not native.validate_discovery_request(response, constants.MAGIC_WORD)
    assert not native.validate_discovery_request(b"\xff\xfe\x00", constants.MAGIC_WORD)
    assert not native.validate_discovery_request(b"", constants.MAGIC_WORD)


# --- discovery ---------------------------------------------------------------

@pytest.mark.parametrize("use_native", [True, False])
def test_discovery_roundtrip(use_native):
    if use_native and not native.available():
        pytest.skip("native core not built")
    with DiscoveryResponder(ident(), port=TEST_UDP_PORT, use_native=use_native):
        found = discover_receivers(
            timeout_s=0.7, port=TEST_UDP_PORT, targets=["127.0.0.1"]
        )
    assert len(found) == 1
    assert found[0].device_name == "test-rx"
    assert found[0].response.opus_version == "libopus 1.3.1"


def test_discovery_ignores_wrong_magic_datagrams():
    with DiscoveryResponder(ident(), port=TEST_UDP_PORT, use_native=False):
        # a stranger's datagram on the same port must get no reply
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.settimeout(0.4)
            s.sendto(
                BroadcastMessage(0x999, discovery_request=True).encode(),
                ("127.0.0.1", TEST_UDP_PORT),
            )
            with pytest.raises(socket.timeout):
                s.recvfrom(2048)


def test_discovery_timeout_no_responders():
    found = discover_receivers(timeout_s=0.3, port=48799, targets=["127.0.0.1"])
    assert found == []


# --- audio session -----------------------------------------------------------

def make_server(sink, **kw):
    return AudioStreamServer(ident(), frame_sink=sink, port=0, **kw)


def test_stream_hello_negotiation_and_frames():
    got = []
    with make_server(got.append) as server:
        rx = RemoteAudioReceiver("127.0.0.1", server.bound_port).connect()
        assert rx.max_encoded_frame_size == constants.MAX_ENCODED_FRAME_SIZE
        assert rx.max_decoded_frame_size == constants.MAX_DECODED_FRAME_SIZE
        frames = [bytes([i]) * (10 + i) for i in range(30)]
        for f in frames:
            rx.send_frame(f)
        deadline = time.monotonic() + 2
        while len(got) < 30 and time.monotonic() < deadline:
            time.sleep(0.01)
        rx.close()
    assert got == frames


def test_session_enforces_negotiated_cap():
    with make_server(lambda f: None, max_encoded_frame_size=100) as server:
        rx = RemoteAudioReceiver("127.0.0.1", server.bound_port).connect()
        assert rx.max_encoded_frame_size == 100
        with pytest.raises(ValueError, match="negotiated cap"):
            rx.send_frame(b"x" * 101)
        rx.close()


def test_server_decode_error_resets_and_reaccepts():
    """Garbage on the stream drops the client; the server then serves a new
    one (network.cpp:432-434 semantics)."""
    got = []
    with make_server(got.append) as server:
        sock = socket.create_connection(("127.0.0.1", server.bound_port))
        DelimitedDecoder().feed(sock.recv(4096))  # swallow hello
        sock.sendall(b"\xff" * 64)  # corrupt length prefix
        time.sleep(0.3)
        sock.close()
        assert server.decode_errors == 1
        # new client works fine
        rx = RemoteAudioReceiver("127.0.0.1", server.bound_port).connect()
        rx.send_frame(b"ok")
        deadline = time.monotonic() + 2
        while not got and time.monotonic() < deadline:
            time.sleep(0.01)
        rx.close()
    assert got == [b"ok"]
    assert server.streams_served == 2


def test_receiver_error_feedback_reaches_transmitter():
    feedback = []
    with make_server(lambda f: None) as server:
        rx = RemoteAudioReceiver(
            "127.0.0.1", server.bound_port, on_feedback=feedback.append
        ).connect()
        deadline = time.monotonic() + 2
        while not server.send_error(True, False) and time.monotonic() < deadline:
            time.sleep(0.01)
        while not feedback and time.monotonic() < deadline:
            time.sleep(0.01)
        rx.close()
    assert feedback and feedback[0].audio_underflow is True


def test_session_requires_hello():
    """A server that sends no hello must be rejected (RemoteAudioReceiver.kt:67)."""
    silent = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    silent.bind(("127.0.0.1", 0))
    silent.listen(1)
    port = silent.getsockname()[1]
    accepted = []

    def accept_and_close():
        c, _ = silent.accept()
        accepted.append(c)
        time.sleep(0.2)
        c.close()

    t = threading.Thread(target=accept_and_close, daemon=True)
    t.start()
    with pytest.raises((SessionError, OSError, WireError)):
        RemoteAudioReceiver("127.0.0.1", port, connect_timeout_s=0.5).connect()
    silent.close()


# --- reconnect policy --------------------------------------------------------

def test_reconnect_retries_then_cooldown():
    sleeps = []
    attempts = []

    def connect():
        attempts.append(1)
        if len(attempts) < 13:
            raise ConnectionError("nope")
        return "ok"

    policy = ReconnectPolicy(sleep=sleeps.append)
    assert policy.run(connect) == "ok"
    # 10 immediate retries, cooldown, then success on the 13th attempt
    assert len(attempts) == 13
    assert sleeps == [1.0]
    assert policy.cooldowns == 1


def test_reconnect_bounded_gives_up():
    policy = ReconnectPolicy(max_immediate_retries=2, sleep=lambda s: None)

    def connect():
        raise ConnectionError("always down")

    with pytest.raises(ConnectionError, match="always down"):
        policy.run(connect, max_cooldowns=3)
    assert policy.attempts == 8  # 2 x (3 cooldowns + 1)


def test_server_serves_one_client_at_a_time():
    """Serial accept semantics (network.cpp:496-516): while one transmitter
    streams, a second connection gets no hello until the first leaves."""
    got = []
    with make_server(got.append) as server:
        first = RemoteAudioReceiver("127.0.0.1", server.bound_port).connect()
        second_sock = socket.create_connection(("127.0.0.1", server.bound_port))
        second_sock.settimeout(0.4)
        with pytest.raises(socket.timeout):
            second_sock.recv(1)  # no hello while the first client is served
        first.close()
        # after the first leaves, the queued client gets its hello
        second_sock.settimeout(2.0)
        data = second_sock.recv(4096)
        assert data, "second client never got a hello"
        from anet.proto.framing import DelimitedDecoder as _DD

        frames = _DD().feed(data)
        assert frames and ToTransmitter.decode(frames[0]).receiver_information
        second_sock.close()
    assert server.streams_served == 2


def test_discovery_reports_live_streaming_flag():
    """currently_streaming in discovery responses tracks the actual stream
    state (the firmware hardcodes false with a TODO, network.cpp:372)."""
    from anet.config import ReceiverConfig
    from anet.rx.playback import BufferSink
    from anet.rx.receiver import AnetReceiver

    cfg = ReceiverConfig(
        device_name="live-flag", tcp_audio_port=0, udp_discovery_port=48768
    )
    with AnetReceiver(BufferSink(), cfg) as rx:
        port = rx.network.server.bound_port

        def query():
            found = discover_receivers(
                timeout_s=0.6, port=48768, targets=["127.0.0.1"]
            )
            assert found, "responder did not answer"
            return found[0].response.currently_streaming

        assert query() is False
        session = RemoteAudioReceiver("127.0.0.1", port).connect()
        deadline = time.monotonic() + 2
        while not query() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert query() is True
        session.close()
        deadline = time.monotonic() + 2
        while query() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert query() is False


@needs_native
def test_native_framer_large_frames_beyond_drain_buffer():
    """Frames larger than one drain batch must all surface from a single
    feed (regression: early exit stranded buffered frames)."""
    big = [bytes([i]) * 700_000 for i in range(3)]  # 2.1 MB > 1 MiB out buf
    stream = b"".join(encode_delimited(f) for f in big)
    nf = native.NativeFramer(max_frame=1 << 21)
    got = nf.feed(stream)
    assert [len(f) for f in got] == [700_000] * 3
    assert nf.pending_bytes == 0


def test_paced_sink_pause_before_first_write():
    """pause()/resume() before any write must not raise (regression: killed
    the playback consumer thread)."""
    from anet.rx.playback import BufferSink, PacedSink

    sink = PacedSink(BufferSink())
    sink.pause()
    sink.resume()
    assert sink.buffered_seconds == 0.0
    sink.write(b"\x00" * 19200)  # 0.1 s
    assert sink.buffered_seconds > 0.05


def test_server_soak_many_frames_and_reconnects():
    """Stability: thousands of frames and repeated reconnects through the
    native framer path without drops or leaks."""
    counts = []
    with make_server(lambda f: counts.append(len(f))) as server:
        for session in range(3):
            rx = RemoteAudioReceiver("127.0.0.1", server.bound_port).connect()
            for i in range(1000):
                rx.send_frame(bytes([session]) * (1 + (i * 7) % 1500))
            rx.close()
            deadline = time.monotonic() + 5
            while len(counts) < (session + 1) * 1000 and time.monotonic() < deadline:
                time.sleep(0.01)
        assert len(counts) == 3000
        assert server.streams_served == 3
        assert server.decode_errors == 0
