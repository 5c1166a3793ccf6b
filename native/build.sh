#!/usr/bin/env bash
# Build the native host-side tracklet ops (.so loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC tracklet_ops.cpp -o libtracklet_ops.so
echo "built $(pwd)/libtracklet_ops.so"
