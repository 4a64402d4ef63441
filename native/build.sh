#!/bin/sh
# Build the native host-side helpers into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -shared -fPIC -std=c++17 bvh_builder.cpp -o lib/libbvh_builder.so
echo "built lib/libbvh_builder.so"
