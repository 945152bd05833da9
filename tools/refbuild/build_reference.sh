#!/usr/bin/env bash
# Builds the reference tomahawk binary (from the read-only checkout at
# $REF_DIR) against the mini-htslib shim, producing a cross-validation
# oracle at tools/refbuild/build/tomahawk.
#
# The reference normally needs real htslib (reference makefile:123-133);
# this container has none, so we supply tools/refbuild/mini_htslib — our own
# minimal VCF-text reader implementing exactly the API surface the reference
# uses. Object files and the binary stay in build/ (gitignored); no reference
# source is copied into this repository.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF_DIR="${REF_DIR:-/root/reference}"
BUILD="$HERE/build"
mkdir -p "$BUILD"

if [[ -x "$BUILD/tomahawk" && -x "$BUILD/two_json" \
        && "${FORCE:-0}" != "1" ]]; then
    echo "$BUILD/tomahawk (cached)"
    exit 0
fi

CXX="${CXX:-g++}"
# -include limits/cstring: the reference relies on transitive libstdc++
# includes that gcc-12 no longer provides.
CXXFLAGS="-std=c++11 -O2 -msse4.2 -w -include limits -include cstring -I$REF_DIR/include -I$REF_DIR/lib -I$HERE/mini_htslib -DVERSION=\"0.7.0-oracle\""

objs=()
for src in "$REF_DIR"/lib/*.cpp "$REF_DIR"/lib/ld/*.cpp "$HERE/mini_htslib/vcf_mini.cpp"; do
    obj="$BUILD/$(basename "${src%.cpp}").o"
    # core.cpp ONLY is compiled with -DNDEBUG: its calculateHardyWeinberg
    # miss-branch has a leftover debug assert that aborts on ANY site with
    # missing genotypes (reference lib/core.cpp:110-118, marked "Todo:
    # validate"). Its asserts are all side-effect-free checks, so NDEBUG is
    # safe there — but NOT globally: importer.cpp/zstd_codec.cpp wrap real
    # work in assert(...) (e.g. assert(zcodec.Compress(...)),
    # importer.cpp:296), which NDEBUG would compile away.
    extra=""
    [[ "$(basename "$src")" == "core.cpp" ]] && extra="-DNDEBUG"
    if [[ ! -f "$obj" || "$src" -nt "$obj" ]]; then
        echo "CXX $(basename "$src")"
        $CXX $CXXFLAGS $extra -c -o "$obj" "$src"
    fi
    objs+=("$obj")
done

$CXX -pthread "${objs[@]}" -lzstd -lz -o "$BUILD/tomahawk"

# two_json oracle driver: the reference's PrintLDJson with no CLI
# surface (view -J is commented out, lib/view.h:37,:98) — link the
# same objects minus the reference's main().
nomain=()
for o in "${objs[@]}"; do
    [[ "$(basename "$o")" == "main.o" ]] || nomain+=("$o")
done
$CXX $CXXFLAGS -c -o "$BUILD/two_json.o" "$HERE/two_json.cpp"
$CXX -pthread "$BUILD/two_json.o" "${nomain[@]}" -lzstd -lz \
    -o "$BUILD/two_json"
echo "$BUILD/tomahawk"
