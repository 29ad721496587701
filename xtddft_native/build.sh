#!/bin/sh
# Build the native integral engine -> xtddft_native/libmd_eri.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -std=c++17 md_eri.cpp -o libmd_eri.so
echo "built $(pwd)/libmd_eri.so"
