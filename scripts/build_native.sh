#!/bin/bash
# Build the native host library (libiqtpu_host.so).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
# -ffp-contract=off: no FMA contraction — the FPS distance updates must
# round exactly like the numpy fallback's separate f32 ops, or near-tie
# clouds pick different farthest points and the region partition diverges.
g++ -O3 -march=native -ffp-contract=off -shared -fPIC native/iqtpu_host.cpp -o build/libiqtpu_host.so
echo "built build/libiqtpu_host.so"
