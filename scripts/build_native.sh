#!/bin/bash
# Build the native host library (libiqtpu_host.so).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -shared -fPIC native/iqtpu_host.cpp -o build/libiqtpu_host.so
echo "built build/libiqtpu_host.so"
