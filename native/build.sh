#!/bin/sh
# Build the native C ABI shim (libgooey_tpu_shim.so) and its smoke test.
# Usage: native/build.sh [outdir]   (default: native/build)
set -e
cd "$(dirname "$0")"
OUT="${1:-build}"
mkdir -p "$OUT"

PY_CFLAGS="$(python3-config --includes)"
PY_LDFLAGS="$(python3-config --embed --ldflags 2>/dev/null || python3-config --ldflags)"

python3 gen_shim.py

g++ -O2 -fPIC -shared -std=c++17 -Wall \
    $PY_CFLAGS gooey_shim.cpp gooey_shim_gen.cpp \
    $PY_LDFLAGS \
    -o "$OUT/libgooey_tpu_shim.so"

gcc -O2 -std=c11 -Wall -I../include test_shim.c \
    -L"$OUT" -lgooey_tpu_shim -Wl,-rpath,"$(pwd)/$OUT" \
    -o "$OUT/test_shim"

echo "built $OUT/libgooey_tpu_shim.so and $OUT/test_shim"
