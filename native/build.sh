#!/bin/sh
# Build the native engines -> native/libnpy_collate.so + libvideo_decode.so
# (+ libvideo_decode_av.so when the system libav* dev headers exist)
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libnpy_collate.so npy_collate.cc
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libvideo_decode.so video_decode.cc -ljpeg
if [ -f /usr/include/x86_64-linux-gnu/libavcodec/avcodec.h ] || [ -f /usr/include/libavcodec/avcodec.h ]; then
    g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
        -o libvideo_decode_av.so video_decode_av.cc \
        -lavformat -lavcodec -lavutil -lswscale
fi
echo "built $(pwd): libnpy_collate.so libvideo_decode.so $( [ -f libvideo_decode_av.so ] && echo libvideo_decode_av.so )"
