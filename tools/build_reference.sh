#!/bin/bash
# Build the single-rank reference binary (for golden generation and CPU
# throughput baselines) against the MPI stub in tools/mpi_stub.
# Usage: tools/build_reference.sh [outdir]   (default /tmp/aither_ref)
set -e
REF=/root/reference
OUT=${1:-/tmp/aither_ref}
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT/include"

# macros.hpp from the cmake template (version numbers are cosmetic)
sed -e 's/@aither_VERSION_MAJOR@/1/' -e 's/@aither_VERSION_MINOR@/0/' \
    -e 's/@aither_VERSION_PATCH@/0/' \
    "$REF/include/macros.hpp.in" > "$OUT/include/macros.hpp"

if [ -f "$OUT/aither" ] && [ "$OUT/aither" -nt "$HERE/mpi_stub/mpi.h" ]; then
  echo "reference binary up to date: $OUT/aither"
  exit 0
fi

cd "$OUT"
g++ -O3 -march=native -std=c++14 -DNDEBUG \
    -I "$REF/include" -I "$OUT/include" -I "$HERE/mpi_stub" \
    "$REF"/src/*.cpp -o "$OUT/aither"
echo "built $OUT/aither"
