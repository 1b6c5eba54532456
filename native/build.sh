#!/bin/sh
# Build the native components into claragenomicsanalysis_tpu/io/_native/.
set -e
cd "$(dirname "$0")"
OUT=../claragenomicsanalysis_tpu/io/_native
mkdir -p "$OUT"
g++ -O3 -std=c++17 -shared -fPIC fasta_parser.cpp -lz -o "$OUT/libfasta.so"
echo "built $OUT/libfasta.so"
g++ -O3 -std=c++17 -shared -fPIC traceback.cpp -o "$OUT/libtraceback.so"
echo "built $OUT/libtraceback.so"
g++ -O3 -std=c++17 -shared -fPIC pack2.cpp -o "$OUT/libpack2.so"
echo "built $OUT/libpack2.so"
