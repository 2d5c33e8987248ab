#!/bin/sh
# Build libpst_native.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -pthread -shared -fPIC -o libpst_native.so pst_native.cpp
echo "built $(pwd)/libpst_native.so"
