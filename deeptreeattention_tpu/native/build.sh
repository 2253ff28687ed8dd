#!/bin/bash
# Build the native geotiff decoder -> libdta_native.so (ctypes-loaded).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    geotiff.cc -o libdta_native.so -lz
echo "built $(pwd)/libdta_native.so"
