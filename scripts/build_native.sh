#!/bin/bash
# Pre-build the native host-pipeline kernels into the same content-addressed
# cache path vqcpcb_tpu.native.lib() builds on demand (no binary lives in
# the tree; a source edit changes the hash, so stale builds can't load).
set -euo pipefail
SRC="$(cd "$(dirname "$0")/.." && pwd)/vqcpcb_tpu/native/tokenizer.cpp"
HASH=$(sha1sum "$SRC" | cut -c1-12)
CACHE="${VQCPCB_NATIVE_CACHE:-$HOME/.cache/vqcpcb_tpu}"
OUT="$CACHE/libvqcpcb_native-$HASH.so"
mkdir -p "$CACHE"
g++ -O3 -shared -fPIC -o "$OUT" "$SRC"
echo "built $OUT"
