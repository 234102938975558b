#!/bin/sh
# Build libwavedata.so (native data-loader core).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    -o libwavedata.so wavedata.cc
echo "built $(pwd)/libwavedata.so"
