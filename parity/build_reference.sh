#!/bin/bash
# Build the read-only C++ reference out-of-tree for parity testing.
# Usage: parity/build_reference.sh [build_dir]   (default /tmp/mvt_ref_build)
# The reference checkout location defaults to /root/reference (this dev
# environment); CI runners provisioned with a copy elsewhere point
# MVT_REFERENCE_DIR at it (see .github/workflows/ci.yml's fuzz job).
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${MVT_REFERENCE_DIR:-/root/reference}"
BUILD="${1:-/tmp/mvt_ref_build}"

if [ ! -f "$REF/CMakeLists.txt" ]; then
  echo "reference checkout not found at $REF (set MVT_REFERENCE_DIR)" >&2
  exit 1
fi

mkdir -p "$BUILD"
cmake -S "$REF" -B "$BUILD" \
  -DCMAKE_BUILD_TYPE=Release \
  -DCMAKE_PREFIX_PATH="$HERE/fmt_shim" \
  -DBUILD_TOOLS=OFF >"$BUILD/cmake.log" 2>&1
cmake --build "$BUILD" -j"$(nproc)" --target motion_trim \
  >"$BUILD/build.log" 2>&1

gcc -shared -fPIC -O2 "$HERE/interpose_system.c" \
  -o "$BUILD/libinterpose_system.so"

echo "$BUILD/motion_trim"
