#!/bin/sh
# Build the native graph preprocessing runtime.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 graphcore.cpp -o libgraphcore.so
echo "built $(pwd)/libgraphcore.so"
