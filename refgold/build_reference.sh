#!/bin/bash
# Build the reference pbrt-v3 binary (from the read-only mount at
# /root/reference) for golden-image generation.  The glog/openexr/ptex/zlib
# submodules are absent, so we compile against the shim headers in
# refgold/shim/ and swap textures/ptex.cpp for refgold/ptex_stub.cpp.
# Output: /root/repo/.refbuild/pbrt_exe  (the .refbuild dir is gitignored —
# it contains copied reference source, which must never be committed).
set -euo pipefail

REF=/root/reference
REPO=/root/repo
BUILD=$REPO/.refbuild
SHIM=$REPO/refgold/shim

mkdir -p "$BUILD"
# Copy reference source once (read-only mount; we never modify the original).
if [ ! -d "$BUILD/src" ]; then
  cp -r "$REF/src" "$BUILD/src"
fi

OBJ=$BUILD/obj
mkdir -p "$OBJ"

CXX=${CXX:-g++}
CXXFLAGS="-O2 -std=gnu++14 -fext-numeric-literals -include climits -include cstdint -pthread -DNDEBUG -w
  -DPBRT_HAVE_HEX_FP_CONSTANTS -DPBRT_HAVE_BINARY_CONSTANTS
  -DPBRT_CONSTEXPR=constexpr -DPBRT_HAVE_ALIGNAS -DPBRT_HAVE_ALIGNOF
  -DPBRT_HAVE_ITIMER -DPBRT_HAVE_MMAP -DPBRT_HAVE_NONPOD_IN_UNIONS
  -DPBRT_NOINLINE= -DPBRT_THREAD_LOCAL=thread_local
  -DPBRT_HAVE_POSIX_MEMALIGN -DPBRT_HAVE_ALLOCA_H -DPBRT_HAVE_MEMORY_H
  -I$SHIM -I$BUILD/src -I$BUILD/src/core"

SRCS=$(ls "$BUILD"/src/core/*.cpp \
          "$BUILD"/src/accelerators/*.cpp \
          "$BUILD"/src/cameras/*.cpp \
          "$BUILD"/src/filters/*.cpp \
          "$BUILD"/src/integrators/*.cpp \
          "$BUILD"/src/lights/*.cpp \
          "$BUILD"/src/materials/*.cpp \
          "$BUILD"/src/media/*.cpp \
          "$BUILD"/src/samplers/*.cpp \
          "$BUILD"/src/shapes/*.cpp \
          "$BUILD"/src/textures/*.cpp \
          "$BUILD"/src/main/pbrt.cpp \
          "$BUILD"/src/ext/lodepng.cpp \
          "$BUILD"/src/ext/targa.cpp \
          "$BUILD"/src/ext/rply.cpp)
# ptex needs the absent Ptex library — use the stub instead.
SRCS=$(echo "$SRCS" | grep -v 'textures/ptex.cpp')
SRCS="$SRCS $REPO/refgold/ptex_stub.cpp"

# Generate a Makefile so builds are incremental and parallel.
MK=$BUILD/Makefile
{
  echo "CXXFLAGS := $(echo $CXXFLAGS)"
  echo "OBJS :="
  for s in $SRCS; do
    o=$OBJ/$(echo "${s#/}" | tr '/' '_' | sed 's/\.cpp$/.o/')
    echo "OBJS += $o"
    echo "$o: $s"
    printf '\t$(CXX) $(CXXFLAGS) -c %s -o %s\n' "$s" "$o"
  done
  echo "$BUILD/pbrt_exe: \$(OBJS)"
  printf '\t$(CXX) $(CXXFLAGS) $(OBJS) -o %s/pbrt_exe -lpthread\n' "$BUILD"
  echo "all: $BUILD/pbrt_exe"
} > "$MK"

# One TU must define the glog-shim flag globals.
sed -i 's|\$(CXX) \$(CXXFLAGS) -c '"$BUILD"'/src/main/pbrt.cpp|\$(CXX) \$(CXXFLAGS) -DPBRT_SHIM_GLOG_IMPL -c '"$BUILD"'/src/main/pbrt.cpp|' "$MK"

make -C "$BUILD" -f "$MK" -j"$(nproc)" all
echo "Built: $BUILD/pbrt_exe"
