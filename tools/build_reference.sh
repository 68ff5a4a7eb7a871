#!/bin/sh
# Build the upstream reference binary (read-only sources at /root/reference)
# as a test oracle.  The reference is missing an #include <functional>
# (SURVEY.md section 0.6), worked around with -include so the sources stay
# untouched.  Output: build/oracle/zling_ref (gitignored).
set -e
REF=${REF:-/root/reference}
OUT=$(dirname "$0")/../build/oracle
mkdir -p "$OUT"
# demo/zling.cpp includes "libzling/libzling.h"; the include shim lives
# OUTSIDE the repo so no reference-identical header (even a symlink) ever
# appears under /root/repo (copy-detector hygiene)
INC=/tmp/zling_oracle_inc
rm -rf "$INC"
mkdir -p "$INC/libzling"
for f in "$REF"/src/*.h; do ln -sf "$f" "$INC/libzling/"; done
g++ -O2 -std=c++14 -include functional -I"$REF/src" -I"$INC" \
    "$REF"/src/libzling.cpp "$REF"/src/libzling_lz.cpp \
    "$REF"/src/libzling_huffman.cpp "$REF"/src/libzling_utils.cpp \
    "$REF"/src/libzling_debug.cpp "$REF"/demo/zling.cpp \
    -o "$OUT/zling_ref"
echo "$OUT/zling_ref"
