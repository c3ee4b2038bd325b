#!/usr/bin/env bash
# Static-analysis gate for the native C++ (the analogue of the reference's
# .clang-tidy / .cppcheck_suppress / CPPLINT rig, /root/reference/.clang-tidy):
# this image ships no clang-tidy or cppcheck, so the gate is GCC 12's
# strictest relevant warning set, warnings-as-errors, over every native
# source in both build profiles (default and -DABISMAL_SHORT).
#
# Usage: tools/static_analysis.sh   (exits non-zero on any finding)
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WARN=(-Wall -Wextra -Wpedantic -Wshadow -Wvla -Wformat=2 -Wundef
      -Wpointer-arith -Wcast-qual -Wwrite-strings -Wdouble-promotion
      -Wmissing-field-initializers -Woverflow -Werror)
for prof in "" "-DABISMAL_SHORT"; do
  for src in "$REPO"/abismal_tpu/native/*.cpp; do
    echo "checking $(basename "$src") ${prof:-(default)}"
    g++ -std=c++17 -O1 -fsyntax-only $prof "${WARN[@]}" \
      -march=native -pthread "$src"
  done
done
echo "static analysis clean"
