#!/bin/sh
# Build the native data-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    patent_io.cc -lz -o libpatent_io.so
echo "built $(pwd)/libpatent_io.so"
