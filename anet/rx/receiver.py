"""The assembled receiver: config -> playback -> network -> status.

The main.cpp analog (main.cpp:9-21): modules brought up in dependency
order on a ReceiverRuntime. The network module serves discovery + audio;
frames flow into the playback pipeline's bounded queue; underflow and
decode errors flow BACK to the transmitter as ReceiverError (the loop the
reference designed but never wired, ip.proto:56-61).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

from anet.codec import opus_version
from anet.config import ReceiverConfig
from anet.net.discovery import DiscoveryResponder
from anet.net.server import AudioStreamServer
from anet.proto import DiscoveryResponse
from anet.rx.playback import PlaybackPipeline, PlaybackSink
from anet.rx.runtime import Module, ReceiverRuntime

logger = logging.getLogger("anet.rx.receiver")


class PlaybackModule(Module):
    name = "playback"

    def __init__(self, pipeline: PlaybackPipeline) -> None:
        self.pipeline = pipeline

    def initialize(self, runtime: ReceiverRuntime) -> None:
        self.pipeline.start()

    def shutdown(self) -> None:
        self.pipeline.stop()

    def status(self) -> Dict:
        return self.pipeline.status()


class NetworkModule(Module):
    """Discovery responder + audio server (the network.cpp analog)."""

    name = "network"

    def __init__(
        self,
        config: ReceiverConfig,
        pipeline: PlaybackPipeline,
        streaming_flag_in_discovery: bool = True,
    ) -> None:
        self.config = config
        self.pipeline = pipeline
        self._streaming = False
        self._streaming_in_discovery = streaming_flag_in_discovery
        self.responder: Optional[DiscoveryResponder] = None
        self.server: Optional[AudioStreamServer] = None

    def identity(self) -> DiscoveryResponse:
        """This receiver's card. Unlike the firmware (which hardcodes
        currently_streaming=false with a TODO, network.cpp:372), the flag
        is real."""
        return DiscoveryResponse(
            protocol_version=1,
            mac_address=self.config.resolved_mac(),
            device_name=self.config.device_name,
            currently_streaming=self._streaming if self._streaming_in_discovery else False,
            opus_version=opus_version(),
        )

    def initialize(self, runtime: ReceiverRuntime) -> None:
        self.server = AudioStreamServer(
            identity=self.identity(),
            frame_sink=self.pipeline.queue_frame,
            on_new_stream=self._on_new_stream,
            on_stream_end=self._on_stream_end,
            port=self.config.tcp_audio_port,
            max_encoded_frame_size=self.config.max_encoded_frame_size,
            max_decoded_frame_size=self.config.max_decoded_frame_size,
        ).start()
        self.responder = DiscoveryResponder(
            self.identity(), port=self.config.udp_discovery_port
        ).start()

    def _on_new_stream(self) -> None:
        self._streaming = True
        self.pipeline.start_new_stream()
        if self.responder is not None:
            self.responder.update_identity(self.identity())

    def _on_stream_end(self) -> None:
        self._streaming = False
        if self.responder is not None:
            self.responder.update_identity(self.identity())

    def send_feedback(self, underflow: bool, decode_error: bool) -> None:
        if self.server is not None:
            self.server.send_error(underflow, decode_error)

    def shutdown(self) -> None:
        if self.responder is not None:
            self.responder.stop()
        if self.server is not None:
            self.server.stop()

    def status(self) -> Dict:
        return {
            "streaming": self._streaming,
            "streams_served": self.server.streams_served if self.server else 0,
            "decode_errors": self.server.decode_errors if self.server else 0,
            "audio_port": (
                self.server.bound_port if self.server else self.config.tcp_audio_port
            ),
        }


class AnetReceiver:
    """Turn-key receiver (discovery + audio server + playback to a sink)."""

    def __init__(
        self,
        sink: PlaybackSink,
        config: Optional[ReceiverConfig] = None,
    ) -> None:
        self.config = config or ReceiverConfig()
        self.pipeline = PlaybackPipeline(
            sink,
            queue_depth=self.config.queue_depth,
            feedback=self._feedback,
        )
        self.network = NetworkModule(self.config, self.pipeline)
        self.runtime = (
            ReceiverRuntime()
            .register(PlaybackModule(self.pipeline))
            .register(self.network)
        )

    def _feedback(self, underflow: bool, decode_error: bool) -> None:
        self.network.send_feedback(underflow, decode_error)

    def start(self) -> "AnetReceiver":
        self.runtime.start()
        return self

    def stop(self) -> None:
        self.runtime.stop()

    def status(self) -> Dict:
        return self.runtime.status()

    def __enter__(self) -> "AnetReceiver":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
