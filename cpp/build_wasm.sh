#!/bin/bash
# Build the browser WASM engine from the C++ host engine.
# Counterpart of the reference's infer/build_wasm.sh:1-38 (wasi-sdk
# clang + wasm-ld there; emscripten here — one tool, same export set).
#
# This image ships no wasm toolchain (verified: no emcc/wasi-sdk), so
# the script gates on `emcc` and exits 2 with instructions when absent.
# The bridge logic itself is execution-tested natively by
# tests/test_cpp_engine.py::test_wasm_bridge_*, so a machine with emcc
# only needs this one command:
#
#   cd cpp && ./build_wasm.sh        # -> ../web/nano_engine.wasm/.js
set -eu
cd "$(dirname "$0")"

if ! command -v emcc >/dev/null 2>&1; then
    echo "build_wasm.sh: emcc not found — install emscripten" \
         "(https://emscripten.org/docs/getting_started/) and re-run." >&2
    echo "The native engine (make all) and the pure-JS engine" \
         "(web/nano_infer.js) do not need it." >&2
    exit 2
fi

# -ffast-math intentionally absent: it breaks cross-engine numeric
# parity (same rule as the native Makefile).  OpenMP pragmas compile
# away; the x86 intrinsic paths are #ifdef-gated out on wasm.
emcc -std=c++17 -O3 \
    nano.cpp main_wasm.cpp \
    -o ../web/nano_engine.js \
    -s WASM=1 \
    -s MODULARIZE=1 \
    -s EXPORT_NAME=createNanoEngine \
    -s ALLOW_MEMORY_GROWTH=1 \
    -s EXPORTED_FUNCTIONS='["_malloc","_free","_init_nano","_set_sampler","_vocab_size_external","_max_seq_len_external","_generate_next_token_external","_encode_external","_decode_external","_load_lora_external","_unload_lora_external","_close_nano"]' \
    -s EXPORTED_RUNTIME_METHODS='["HEAPU8","HEAP32","HEAPU32","ccall","cwrap"]' \
    --no-entry

echo "wrote ../web/nano_engine.js + ../web/nano_engine.wasm"
