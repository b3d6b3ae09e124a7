"""Protocol-wide constants.

These pin the wire contract shared with the reference system so that anet
interoperates byte-for-byte with both reference implementations.

Sources in the reference (/root/reference):
- magic word / ports:        protocol/ip.proto:7,10,31
- protocol version:          hardware/src/network.cpp:369 (protocol_version=1)
- frame caps:                hardware/src/network.cpp:24,392 (4096 encoded),
                             hardware/src/playback.cpp:10 (11520 decoded)
- decode format:             hardware/src/playback.cpp:9 (48 kHz 16-bit stereo)
- queue depth:               hardware/src/playback.cpp:152 (40 frames)
- pacing bucket:             transmitter MulticastAudioOutput.kt:86
                             (capacity 1200 ms, drain 1000 ms/s)
- discovery timeout:         transmitter discovery.kt:25 (2 s)
- reconnect policy:          hardware/include/network.hpp:7-8
                             (10 retries, 1000 ms cooldown)
- string caps (nanopb):      hardware/src/protogen/protobuf_ip.options:1-2
                             (max_size:128 including NUL -> 127 usable bytes)
"""

# --- discovery / transport ---------------------------------------------------
MAGIC_WORD = 0x2C5DA044
UDP_DISCOVERY_PORT = 58765
TCP_AUDIO_PORT = 58764
PROTOCOL_VERSION = 1
DISCOVERY_TIMEOUT_S = 2.0

# --- frame geometry ----------------------------------------------------------
MAX_ENCODED_FRAME_SIZE = 4096
MAX_DECODED_FRAME_SIZE = 11520  # 60 ms @ 48 kHz, 16-bit, stereo

DECODE_SAMPLE_RATE_HZ = 48_000
DECODE_BITS_PER_SAMPLE = 16
DECODE_CHANNELS = 2

# --- receiver pipeline -------------------------------------------------------
RX_FRAME_QUEUE_DEPTH = 40  # ~2.4 s of audio at 60 ms frames

# --- transmitter pacing ------------------------------------------------------
PACING_BUCKET_CAPACITY_MS = 1200.0
PACING_DRAIN_MS_PER_S = 1000.0

# --- connection recovery -----------------------------------------------------
RECONNECT_MAX_IMMEDIATE_RETRIES = 10
RECONNECT_COOLDOWN_MS = 1000

# --- nanopb-compatible string limits ----------------------------------------
# protobuf_ip.options:1-2 sets max_size:128, but nanopb's max_size counts
# the NUL terminator: the firmware's pb_decode rejects a 128-byte string
# with "string overflow" (pb_decode.c pb_dec_string; verified against the
# real codec by tests/test_nanopb_cross.py). 127 usable bytes.
MAX_DEVICE_NAME_BYTES = 127
MAX_OPUS_VERSION_BYTES = 127

# --- codec envelope (reference OpusEncoder.kt:54,195-203) --------------------
DEFAULT_OPUS_BITRATE_BPS = 92_000
SUPPORTED_SAMPLE_RATES_HZ = (8_000, 12_000, 16_000, 24_000, 48_000)
SUPPORTED_FRAME_DURATIONS_MS = (2.5, 5.0, 10.0, 20.0, 40.0, 60.0)
DEFAULT_FRAME_DURATION_MS = 60.0
