#!/usr/bin/env bash
# Build the native host-IO library (libcacoph_wavio.so).
set -euo pipefail
cd "$(dirname "$0")"
# no -march=native: the .so may outlive the build host (shared FS /
# container images); the decoder is IO-bound anyway
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    wavio.cpp flacio.cpp -o libcacoph_wavio.so
echo "built $(pwd)/libcacoph_wavio.so"
