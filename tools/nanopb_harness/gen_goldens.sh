#!/bin/sh
# Regenerate the committed nanopb golden vectors (tests/golden/nanopb_*)
# from the REAL nanopb encoder. Run after any harness or schema change:
#   sh tools/nanopb_harness/gen_goldens.sh
set -e
cd "$(dirname "$0")"
make
H=build/nanopb_harness
G=../../tests/golden

$H encode-hello 1 187723572702975 "esp32 loudspeaker" 0 "libopus 1.3.1" 4096 11520 \
    > "$G/nanopb_hello.bin"

python3 - "$H" "$G" <<'EOF'
import subprocess, sys
h, g = sys.argv[1], sys.argv[2]
frames = [b"\x01", bytes(range(256)) * 4 + b"\x00" * 176, b"\xab" * 4096]
assert [len(f) for f in frames] == [1, 1200, 4096]
stdin = b"".join(len(f).to_bytes(4, "big") + f for f in frames)
out = subprocess.run([h, "encode-audio"], input=stdin, capture_output=True, check=True)
open(f"{g}/nanopb_audio.bin", "wb").write(out.stdout)
EOF

$H encode-broadcast-response 1 187723572702975 "esp32 loudspeaker" 0 "libopus 1.3.1" \
    > "$G/nanopb_broadcast_response.bin"
echo "goldens written"
