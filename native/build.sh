#!/bin/bash
# Build the native host-IO library (NIfTI reader + threaded resampler).
# Prefers libdeflate (2-3x faster gzip inflate than zlib — the embed
# pipeline's measured floor); falls back to zlib-only when absent.
set -euo pipefail
cd "$(dirname "$0")"

common=(-O3 -march=native -std=c++17 -shared -fPIC pd_io.cpp -lz -o libpd_io.so)
if g++ -DPD_HAVE_LIBDEFLATE "${common[@]}" -ldeflate 2>/dev/null; then
    echo "built native/libpd_io.so (libdeflate inflate)"
else
    g++ "${common[@]}"
    echo "built native/libpd_io.so (zlib inflate)"
fi
