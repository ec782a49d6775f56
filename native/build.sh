#!/bin/bash
# Build the native host-IO library (NIfTI reader + threaded resampler).
# Prefers libdeflate (2-3x faster gzip inflate than zlib — the embed
# pipeline's measured floor); falls back to zlib-only when absent.
set -euo pipefail
cd "$(dirname "$0")"

# Build to a private temp and rename into place: rename(2) is atomic on
# the same filesystem, so a concurrent process never dlopens a
# half-linked .so (several processes can race into the stale-rebuild
# path after pd_io.cpp changes).
tmp="libpd_io.so.tmp.$$"
trap 'rm -f "$tmp"' EXIT
common=(-O3 -march=native -std=c++17 -shared -fPIC pd_io.cpp -lz -o "$tmp")
if g++ -DPD_HAVE_LIBDEFLATE "${common[@]}" -ldeflate 2>/dev/null; then
    mv -f "$tmp" libpd_io.so
    echo "built native/libpd_io.so (libdeflate inflate)"
else
    g++ "${common[@]}"
    mv -f "$tmp" libpd_io.so
    echo "built native/libpd_io.so (zlib inflate)"
fi
