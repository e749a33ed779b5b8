#!/bin/sh
# Build the native fast-load library next to this script.
# The Python side (dpmmsubclusters_tpu/io/npy.py) falls back to pure numpy
# when the .so is absent, so building is optional.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libdpmmfastload.so fastload.cc
echo "built native/libdpmmfastload.so"
