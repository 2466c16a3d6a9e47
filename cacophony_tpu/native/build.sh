#!/usr/bin/env bash
# Build the native host-IO library (libcacoph_wavio.so).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    wavio.cpp -o libcacoph_wavio.so
echo "built $(pwd)/libcacoph_wavio.so"
