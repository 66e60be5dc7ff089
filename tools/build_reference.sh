#!/usr/bin/env bash
# Build the C++ reference (lordnn/OF_DIS at /root/reference) for golden
# generation. Not part of the framework — test tooling only.
#
# Toolchain notes (this image): OpenCV4 via pkg-config; Eigen3 from the
# TensorFlow wheel's bundled headers; the FDF1.0.1 .c files are C-style C++
# (SSE intrinsics + C++ headers) and must be compiled with `-x c++`.
# OpenMP OFF, SSE on — matching the golden-generation config documented in
# tests/test_golden_parity.py.
#
# Usage: tools/build_reference.sh [outdir]   (default /tmp/refbuild)
set -euo pipefail

OUT="${1:-/tmp/refbuild}"
REF=/root/reference
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
OPENCV_CFLAGS="$(pkg-config --cflags opencv4)"
OPENCV_LIBS="-lopencv_core -lopencv_imgproc -lopencv_imgcodecs"

mkdir -p "$OUT"
cp -r "$REF"/*.cpp "$REF"/*.h "$REF"/FDF1.0.1 "$OUT"/
cd "$OUT"

# OpenCV4 dropped the legacy C constants used at run_dense.cpp:201,205;
# map them to the modern IMREAD_* values (0 and 1) on the command line so
# the reference source stays unmodified.
COMPAT="-DCV_LOAD_IMAGE_GRAYSCALE=0 -DCV_LOAD_IMAGE_COLOR=1"
CXX_COMMON="-O3 -std=c++14 -msse4 -Wno-unknown-pragmas $COMPAT -I$EIGEN $OPENCV_CFLAGS"

build_variant() {
  local name="$1" mode="$2" chan="$3"
  local defs="-DSELECTMODE=$mode -DSELECTCHANNEL=$chan -DUSE_SSE"
  local objs=""
  for src in run_dense.cpp oflow.cpp patch.cpp patchgrid.cpp \
             refine_variational.cpp FDF1.0.1/image.cpp \
             FDF1.0.1/opticalflow_aux.c FDF1.0.1/solver.c; do
    local obj="${name}_$(basename "$src" | tr . _).o"
    g++ $CXX_COMMON $defs -x c++ -c "$src" -o "$obj"
    objs="$objs $obj"
  done
  g++ $objs -o "$name" $OPENCV_LIBS
  echo "built $OUT/$name"
}

build_variant run_OF_INT 1 1
build_variant run_OF_GRD 1 2
build_variant run_OF_RGB 1 3
build_variant run_DE_INT 2 1
build_variant run_DE_GRD 2 2
build_variant run_DE_RGB 2 3
