#!/bin/bash
# Build the native host-pipeline kernels.
set -euo pipefail
cd "$(dirname "$0")/../vqcpcb_tpu/native"
g++ -O3 -shared -fPIC -o libvqcpcb_native.so tokenizer.cpp
echo "built $(pwd)/libvqcpcb_native.so"
