#!/bin/sh
# Build the native dataloader shared library.
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libvslam_native.so dataloader.cpp -lpng -lz -lpthread
echo "built $(pwd)/libvslam_native.so"
