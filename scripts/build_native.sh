#!/bin/sh
# Build the native host-side IO library (native/msynth_io.cc) into
# music_synthesis_tpu/data/_native/libmsynth_io.so, loaded via ctypes.
set -e
cd "$(dirname "$0")/.."
mkdir -p music_synthesis_tpu/data/_native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/msynth_io.cc \
    -o music_synthesis_tpu/data/_native/libmsynth_io.so
echo "built music_synthesis_tpu/data/_native/libmsynth_io.so"
