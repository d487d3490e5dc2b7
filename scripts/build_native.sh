#!/bin/bash
# Build the C++ data-path library (csrc/waldo_native.cpp -> libwaldo_native.so).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    csrc/waldo_native.cpp -o build/libwaldo_native.so
echo "built build/libwaldo_native.so"
