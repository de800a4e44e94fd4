#!/bin/bash
# Build the native host-side preprocessing library.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p bayesdll_tpu/native
g++ -O3 -march=native -shared -fPIC \
    bayesdll_tpu/native/preprocess.cc \
    -o bayesdll_tpu/native/libbdltpu.so
echo "built bayesdll_tpu/native/libbdltpu.so"
