#!/bin/bash
# Build the native host-IO library (NIfTI reader + threaded resampler).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC pd_io.cpp -lz -o libpd_io.so
echo "built native/libpd_io.so"
