#!/bin/sh
# Build the native engines -> native/libnpy_collate.so + native/libvideo_decode.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libnpy_collate.so npy_collate.cc
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libvideo_decode.so video_decode.cc -ljpeg
echo "built $(pwd)/libnpy_collate.so $(pwd)/libvideo_decode.so"
