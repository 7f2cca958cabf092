#!/bin/sh
# Build the native data-loading engine -> native/libnpy_collate.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libnpy_collate.so npy_collate.cc
echo "built $(pwd)/libnpy_collate.so"
