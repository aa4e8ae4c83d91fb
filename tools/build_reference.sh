#!/bin/sh
# Build the reference solver (/root/reference/src) with a chosen compile-time
# module toggle, WITHOUT touching the read-only reference tree: sources are
# copied to a temp dir, the #define block (src/main.cpp:54-59) is rewritten,
# and the portable g++/OpenMP line from the makefile (src/makefile:5,7) is
# used.  This reproduces the round-2 golden provenance (goldens/README.md)
# and extends it to the Turek_Hron / Rolling / Hydroelastic modules.
#
# Usage: tools/build_reference.sh <module> <out_binary> [extra...]
#   module     one of: bar bar_vp dam turek rolling rolling1 hydroelastic
#   out_binary absolute path for the built binary
#   extra      "cuda_prof" applies nothing extra (placeholder)
set -e
module="$1"; out="$2"
[ -n "$module" ] && [ -n "$out" ] || { echo "usage: $0 <module> <out>"; exit 2; }
ref=/root/reference/src
bld=$(mktemp -d)
cp "$ref"/main.cpp "$ref"/errorfunc.cpp "$ref"/errorfunc.h "$ref"/log.cpp "$ref"/log.h "$bld"/

# Neutralize the shipped toggle block, then enable the requested module(s).
# The shipped state is `#define Bar_Module` with the rest commented out.
py_edit() {
python3 - "$bld/main.cpp" "$module" <<'EOF'
import re, sys
path, module = sys.argv[1], sys.argv[2]
src = open(path).read()
# turn OFF the shipped Bar_Module define
src = src.replace("#define Bar_Module\n", "//#define Bar_Module\n", 1)
defs = {
    "bar": ["Bar_Module"],
    # bar with the initial first-bending-mode excitation restored
    # (the call at src/main.cpp:571 is shipped commented out)
    "bar_vp": ["Bar_Module"],
    "dam": ["DAM_Module"],
    "turek": ["Turek_Hron"],
    "rolling1": ["Rolling1"],
    # the rocking-wall module: the clamp ifdef in the substep loop is
    # Rolling1/Rolling2; `Rolling` alone only drives the wall kinematics.
    # Combine Rolling + Rolling1 so the elastic clamp also engages the way
    # a user of the reference would configure a rolling-tank FSI run.
    "rolling": ["Rolling", "Rolling1"],
    "hydroelastic": ["Hydroelastic"],
}[module]
inject = "".join(f"#define {d}\n" for d in defs)
src = src.replace("//****PLEASE CHOOSE MODULE ***//\n",
                  "//****PLEASE CHOOSE MODULE ***//\n" + inject, 1)
if module == "bar_vp":
    src = src.replace("\t//setInitialVelocityProfile();\n",
                      "\tsetInitialVelocityProfile();\n", 1)
open(path, "w").write(src)
EOF
}
py_edit
( cd "$bld" && g++ -O2 -fopenmp -c main.cpp errorfunc.cpp log.cpp \
    && g++ -O2 -fopenmp -o ref_bin main.o errorfunc.o log.o -lm )
mv "$bld/ref_bin" "$out"
rm -rf "$bld"
echo "built $module -> $out"
