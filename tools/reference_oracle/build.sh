#!/usr/bin/env bash
# Build the upstream abismal reference binary (for golden-output generation
# in tests ONLY -- the binary is not part of abismal-tpu).  The upstream
# snapshot at $REFERENCE_DIR ships with empty smithlab_cpp/bamxx submodules
# and requires htslib; the shim/ directory provides minimal from-scratch
# stand-ins for exactly the API surface abismal uses.  The resulting binary
# reproduces every md5 in the upstream data/md5sum.txt (index, simulated
# FASTQs, SAM outputs and mstats for SE/PE/PBAT/RPBAT).
set -e
REFERENCE_DIR="${REFERENCE_DIR:-/root/reference}"
OUT_DIR="${1:-/tmp/abismal_reference_oracle}"
SHIM_DIR="$(cd "$(dirname "$0")/shim" && pwd)"
mkdir -p "$OUT_DIR"
# EXTRA_FLAGS: e.g. -DENABLE_SHORT for the window_size=12 build profile
g++ -std=c++17 -O2 ${EXTRA_FLAGS:-} -I "$SHIM_DIR" -I "$REFERENCE_DIR/src" \
  -o "$OUT_DIR/abismal" \
  "$REFERENCE_DIR/src/abismal_main.cpp" \
  "$REFERENCE_DIR/src/abismal.cpp" \
  "$REFERENCE_DIR/src/abismalidx.cpp" \
  "$REFERENCE_DIR/src/AbismalIndex.cpp" \
  "$REFERENCE_DIR/src/simreads.cpp" \
  -lz -lpthread
echo "reference oracle built at $OUT_DIR/abismal"
