#!/bin/sh
# One-shot build without CMake (used by toyslam_tpu/io/native.py's on-demand
# build). Output lands next to this script in build/.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -std=c++17 -O2 -fPIC -shared -Iinclude \
  src/codec.cpp src/timer.cpp src/thread_pool.cpp src/optimizer.cpp \
  src/server.cpp src/capi.cpp \
  -o build/libtoyslam_native.so -lpthread
g++ -std=c++17 -O2 -Iinclude src/server_main.cpp \
  -Lbuild -l:libtoyslam_native.so -Wl,-rpath,'$ORIGIN' \
  -o build/toyslam_server -lpthread
echo "built native/build/libtoyslam_native.so and native/build/toyslam_server"
