/* Cross-validation harness: anet's wire bytes through the REAL receiver
 * codec — nanopb 0.4.5 + the generated ip.pb.c, compiled out of the
 * reference tree by the Makefile (sources are copied to build/ at build
 * time, never vendored here).
 *
 * Each mode mirrors one leg of the reference receiver's protocol I/O:
 *
 *   decode-toreceiver     the TCP audio RX loop: pb_decode_delimited of
 *                         ToReceiver messages from stdin until error/EOF
 *                         (hardware/src/network.cpp:409-430), with the
 *                         4096-byte frame cap enforced in the AudioData
 *                         callback (network.cpp:24,223).
 *   decode-totransmitter  parse delimited ToTransmitter (hello/error)
 *                         messages — the bytes the Kotlin transmitter
 *                         reads (RemoteAudioReceiver.kt), via nanopb.
 *   decode-broadcast      parse ONE raw BroadcastMessage datagram
 *                         (network.cpp:475).
 *   encode-hello ...      emit the receiver's delimited hello
 *                         (network.cpp:394).
 *   encode-error U D      emit a delimited ToTransmitter{error}.
 *   encode-audio          read [u32-be len][bytes]* frames from stdin,
 *                         emit delimited ToReceiver{audio_data} messages.
 *   encode-broadcast-request / encode-broadcast-response ...
 *                         emit raw datagrams (network.cpp:487).
 *
 * Output for decode modes is line-oriented "key=value" text plus hex
 * payload dumps, consumed by tests/test_nanopb_cross.py.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <pb_decode.h>
#include <pb_encode.h>

#include "ip.pb.h"

#define MAX_ENCODED_FRAME_SIZE 4096 /* network.cpp:24 */
#define MAGIC_WORD 0x2C5DA044u      /* ip.proto magic */

typedef struct {
    size_t len;
    uint8_t *data;
} bytes_ctxt;

/* ip.pb.h names this symbol as AudioData.opus_encoded_frame's callback.
 * Decode: enforce the frame cap and stash the bytes (the firmware's
 * version heap-allocates the same way, network.cpp:220-249 — matched
 * behavior, independent code). Encode: write the bytes from arg. */
bool network_pb_callback_audio_data(pb_istream_t *istream, pb_ostream_t *ostream,
                                    const pb_field_t *field) {
    if (istream != NULL) {
        if (field->tag != AudioData_opus_encoded_frame_tag)
            return pb_default_field_callback(istream, ostream, field);
        if (istream->bytes_left > MAX_ENCODED_FRAME_SIZE) {
            istream->errmsg = "audio frame exceeds MAX_ENCODED_FRAME_SIZE";
            return false;
        }
        bytes_ctxt *ctx = malloc(sizeof(bytes_ctxt));
        if (ctx == NULL)
            return false;
        ctx->len = istream->bytes_left;
        ctx->data = malloc(ctx->len ? ctx->len : 1);
        if (ctx->data == NULL)
            return false;
        if (!pb_read(istream, ctx->data, ctx->len))
            return false;
        ((AudioData *)field->message)->opus_encoded_frame.arg = ctx;
        return true;
    }
    if (ostream != NULL) {
        const bytes_ctxt *ctx =
            ((const AudioData *)field->message)->opus_encoded_frame.arg;
        if (ctx == NULL)
            return false;
        if (!pb_encode_tag_for_field(ostream, field))
            return false;
        return pb_encode_string(ostream, ctx->data, ctx->len);
    }
    return false;
}

static bool stdin_istream_cb(pb_istream_t *stream, pb_byte_t *buf, size_t count) {
    size_t got = fread(buf, 1, count, stdin);
    if (got < count) {
        stream->bytes_left = 0;
        return false;
    }
    return true;
}

static bool stdout_ostream_cb(pb_ostream_t *stream, const pb_byte_t *buf,
                              size_t count) {
    (void)stream;
    return fwrite(buf, 1, count, stdout) == count;
}

static void print_hex(const uint8_t *data, size_t len) {
    for (size_t i = 0; i < len; i++)
        printf("%02x", data[i]);
}

static int decode_toreceiver(void) {
    pb_istream_t in = {&stdin_istream_cb, NULL, SIZE_MAX, NULL};
    int frames = 0;
    while (1) {
        int c = fgetc(stdin);
        if (c == EOF) {
            printf("eof frames=%d\n", frames);
            return 0;
        }
        ungetc(c, stdin);
        ToReceiver msg = ToReceiver_init_zero;
        if (!pb_decode_delimited(&in, ToReceiver_fields, &msg)) {
            printf("error frames=%d msg=%s\n", frames,
                   in.errmsg ? in.errmsg : "Unknown");
            return 0;
        }
        if (msg.which_message != ToReceiver_audio_data_tag) {
            printf("error frames=%d msg=unknown message\n", frames);
            return 0;
        }
        bytes_ctxt *ctx = msg.message.audio_data.opus_encoded_frame.arg;
        printf("frame len=%zu data=", ctx->len);
        print_hex(ctx->data, ctx->len);
        printf("\n");
        free(ctx->data);
        free(ctx);
        frames++;
    }
}

static int decode_totransmitter(void) {
    pb_istream_t in = {&stdin_istream_cb, NULL, SIZE_MAX, NULL};
    int msgs = 0;
    while (1) {
        int c = fgetc(stdin);
        if (c == EOF) {
            printf("eof msgs=%d\n", msgs);
            return 0;
        }
        ungetc(c, stdin);
        ToTransmitter msg = ToTransmitter_init_zero;
        if (!pb_decode_delimited(&in, ToTransmitter_fields, &msg)) {
            printf("error msgs=%d msg=%s\n", msgs,
                   in.errmsg ? in.errmsg : "Unknown");
            return 0;
        }
        msgs++;
        if (msg.which_message == ToTransmitter_receiver_information_tag) {
            ReceiverInformation *ri = &msg.message.receiver_information;
            printf("receiver_information protocol_version=%u mac=%llu "
                   "name=%s streaming=%d opus=%s max_enc=%u max_dec=%u\n",
                   (unsigned)ri->discovery_data.protocol_version,
                   (unsigned long long)ri->discovery_data.mac_address,
                   ri->discovery_data.device_name,
                   (int)ri->discovery_data.currently_streaming,
                   ri->discovery_data.opus_version,
                   (unsigned)ri->max_encoded_frame_size,
                   (unsigned)ri->max_decoded_frame_size);
        } else if (msg.which_message == ToTransmitter_error_tag) {
            printf("receiver_error underflow=%d decode_error=%d\n",
                   (int)msg.message.error.audio_underflow,
                   (int)msg.message.error.audio_decode_error);
        } else {
            printf("error msgs=%d msg=unknown oneof\n", msgs);
            return 0;
        }
    }
}

static int decode_broadcast(void) {
    uint8_t buf[4096];
    size_t n = fread(buf, 1, sizeof(buf), stdin);
    pb_istream_t in = pb_istream_from_buffer(buf, n);
    BroadcastMessage msg = BroadcastMessage_init_zero;
    if (!pb_decode(&in, BroadcastMessage_fields, &msg)) {
        printf("error msg=%s\n", in.errmsg ? in.errmsg : "Unknown");
        return 0;
    }
    printf("magic=%08x which=%d", msg.magic_word, (int)msg.which_message);
    if (msg.which_message == BroadcastMessage_discovery_response_tag) {
        DiscoveryResponse *dr = &msg.message.discovery_response;
        printf(" protocol_version=%u mac=%llu name=%s streaming=%d opus=%s",
               (unsigned)dr->protocol_version,
               (unsigned long long)dr->mac_address, dr->device_name,
               (int)dr->currently_streaming, dr->opus_version);
    } else if (msg.which_message == BroadcastMessage_discovery_request_tag) {
        printf(" request=%d", (int)msg.message.discovery_request);
    }
    printf("\n");
    return 0;
}

static void fill_discovery(DiscoveryResponse *dr, char **argv) {
    dr->protocol_version = (uint32_t)strtoul(argv[0], NULL, 10);
    dr->mac_address = strtoull(argv[1], NULL, 10);
    snprintf(dr->device_name, sizeof(dr->device_name), "%s", argv[2]);
    dr->currently_streaming = atoi(argv[3]) != 0;
    snprintf(dr->opus_version, sizeof(dr->opus_version), "%s", argv[4]);
}

static int encode_hello(char **argv) {
    /* argv: proto_ver mac name streaming opus max_enc max_dec */
    ToTransmitter msg = ToTransmitter_init_zero;
    msg.which_message = ToTransmitter_receiver_information_tag;
    fill_discovery(&msg.message.receiver_information.discovery_data, argv);
    msg.message.receiver_information.max_encoded_frame_size =
        (uint32_t)strtoul(argv[5], NULL, 10);
    msg.message.receiver_information.max_decoded_frame_size =
        (uint32_t)strtoul(argv[6], NULL, 10);
    pb_ostream_t out = {&stdout_ostream_cb, NULL, SIZE_MAX, 0, NULL};
    if (!pb_encode_delimited(&out, ToTransmitter_fields, &msg)) {
        fprintf(stderr, "encode failed: %s\n", PB_GET_ERROR(&out));
        return 1;
    }
    return 0;
}

static int encode_error(char **argv) {
    ToTransmitter msg = ToTransmitter_init_zero;
    msg.which_message = ToTransmitter_error_tag;
    msg.message.error.audio_underflow = atoi(argv[0]) != 0;
    msg.message.error.audio_decode_error = atoi(argv[1]) != 0;
    pb_ostream_t out = {&stdout_ostream_cb, NULL, SIZE_MAX, 0, NULL};
    if (!pb_encode_delimited(&out, ToTransmitter_fields, &msg)) {
        fprintf(stderr, "encode failed: %s\n", PB_GET_ERROR(&out));
        return 1;
    }
    return 0;
}

static int encode_audio(void) {
    /* stdin: [u32-be length][payload]* -> delimited ToReceiver messages */
    uint8_t hdr[4];
    static uint8_t payload[MAX_ENCODED_FRAME_SIZE];
    while (fread(hdr, 1, 4, stdin) == 4) {
        size_t len = ((size_t)hdr[0] << 24) | ((size_t)hdr[1] << 16) |
                     ((size_t)hdr[2] << 8) | (size_t)hdr[3];
        if (len > sizeof(payload)) {
            fprintf(stderr, "input frame too large\n");
            return 1;
        }
        if (fread(payload, 1, len, stdin) != len) {
            fprintf(stderr, "truncated input frame\n");
            return 1;
        }
        bytes_ctxt ctx = {len, payload};
        bytes_ctxt *ctxp = &ctx;
        ToReceiver msg = ToReceiver_init_zero;
        msg.which_message = ToReceiver_audio_data_tag;
        msg.message.audio_data.opus_encoded_frame.arg = ctxp;
        pb_ostream_t out = {&stdout_ostream_cb, NULL, SIZE_MAX, 0, NULL};
        if (!pb_encode_delimited(&out, ToReceiver_fields, &msg)) {
            fprintf(stderr, "encode failed: %s\n", PB_GET_ERROR(&out));
            return 1;
        }
    }
    return 0;
}

static int encode_broadcast_request(void) {
    BroadcastMessage msg = BroadcastMessage_init_zero;
    msg.magic_word = MAGIC_WORD;
    msg.which_message = BroadcastMessage_discovery_request_tag;
    msg.message.discovery_request = true;
    pb_ostream_t out = {&stdout_ostream_cb, NULL, SIZE_MAX, 0, NULL};
    if (!pb_encode(&out, BroadcastMessage_fields, &msg))
        return 1;
    return 0;
}

static int encode_broadcast_response(char **argv) {
    BroadcastMessage msg = BroadcastMessage_init_zero;
    msg.magic_word = MAGIC_WORD;
    msg.which_message = BroadcastMessage_discovery_response_tag;
    fill_discovery(&msg.message.discovery_response, argv);
    pb_ostream_t out = {&stdout_ostream_cb, NULL, SIZE_MAX, 0, NULL};
    if (!pb_encode(&out, BroadcastMessage_fields, &msg))
        return 1;
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s MODE [args]\n", argv[0]);
        return 2;
    }
    const char *mode = argv[1];
    if (strcmp(mode, "decode-toreceiver") == 0)
        return decode_toreceiver();
    if (strcmp(mode, "decode-totransmitter") == 0)
        return decode_totransmitter();
    if (strcmp(mode, "decode-broadcast") == 0)
        return decode_broadcast();
    if (strcmp(mode, "encode-hello") == 0 && argc == 9)
        return encode_hello(argv + 2);
    if (strcmp(mode, "encode-error") == 0 && argc == 4)
        return encode_error(argv + 2);
    if (strcmp(mode, "encode-audio") == 0)
        return encode_audio();
    if (strcmp(mode, "encode-broadcast-request") == 0)
        return encode_broadcast_request();
    if (strcmp(mode, "encode-broadcast-response") == 0 && argc == 7)
        return encode_broadcast_response(argv + 2);
    fprintf(stderr, "unknown mode or wrong arg count: %s\n", mode);
    return 2;
}
