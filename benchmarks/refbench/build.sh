#!/bin/sh
# Build the headless reference tracer benchmark (see main.cpp).
# The reference core (pathtracer/mesh/image/pathutil) is GL-free; the only
# GL surface is the GLubyte typedef, provided by shim/GL/glew.h.
#
# The reference is written against MSVC; three MSVC-isms need compile-time
# patches for GCC (applied into a temp dir, never into the repo or the
# reference checkout), all semantics-preserving:
#   1. mesh.cpp:172 passes an rvalue mt19937 to
#      uniform_int_distribution::operator() (takes URNG by lvalue ref) —
#      bind it to a named engine, same fresh-seeded-engine-per-call.
#   2. pathtracer.cpp ClearScene swaps members with rvalue vectors
#      (vec.swap(std::vector<T>())) — flip to the portable
#      std::vector<T>().swap(vec), identical effect.
#   3. pathtracer.cpp:779-780 breaks out of an OpenMP parallel-for on
#      mExit (illegal in conforming OpenMP) — 'continue' skips the row's
#      work instead; mExit is only ever set by Exit(), which this driver
#      never calls, so benchmark behavior is identical.
#   4. pathtracer.cpp:768-774 reserves up to 3 threads for the UI, which
#      yields num_threads(0) (invalid) on a <=2-core machine. The patch
#      clamps to >=1 and honors REFBENCH_THREADS to use the whole machine
#      (there is no UI to reserve cores for in a headless benchmark).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/PathTracing/src
INC=/root/reference/include
OUT="${1:-$HERE/refbench}"
TMP="$(mktemp -d /tmp/refbench_src.XXXXXX)"
trap 'rm -rf "$TMP"' EXIT

python3 - "$REF" "$TMP" <<'EOF'
import sys
ref, tmp = sys.argv[1], sys.argv[2]
src = open(f"{ref}/mesh.cpp").read()
src = src.replace(
    "int axis = mRandAxis(std::mt19937(rd()));",
    "std::mt19937 mtTmp(rd()); int axis = mRandAxis(mtTmp);")
open(f"{tmp}/mesh_patched.cpp", "w").write(src)
src = open(f"{ref}/pathtracer.cpp").read()
for t in ("Triangle", "PathTracerLoader::Object", "Image*"):
    for m in ("mTriangles", "mLoadedObjects", "mLoadedTextures"):
        src = src.replace(f"{m}.swap(std::vector<{t}>());",
                          f"std::vector<{t}>().swap({m});")
src = src.replace("\t\tif (mExit)\n\t\t\tbreak;",
                  "\t\tif (mExit)\n\t\t\tcontinue;")
heur = ("\tint numThreads = omp_get_max_threads();\n"
        "\tif (numThreads > 2)\n\t\tnumThreads -= 3;\n"
        "\telse if (numThreads > 1)\n\t\tnumThreads -= 2;\n"
        "\telse if (numThreads > 0)\n\t\tnumThreads--;\n")
assert heur in src, "thread-heuristic block not found"
src = src.replace(heur, heur.replace(
    "\tint numThreads = omp_get_max_threads();\n",
    "\tint numThreads = omp_get_max_threads();\n"
    "\tconst char* refbenchThreads = std::getenv(\"REFBENCH_THREADS\");\n"
    "\tif (refbenchThreads && std::atoi(refbenchThreads) > 0)\n"
    "\t\tnumThreads = std::atoi(refbenchThreads) + 3;  /* heuristic-neutral */\n")
    + "\tif (numThreads < 1)\n\t\tnumThreads = 1;\n")
src = "#include <cstdlib>\n" + src
open(f"{tmp}/pathtracer_patched.cpp", "w").write(src)
EOF

g++ -O2 -fopenmp -std=c++17 -w \
    -I"$HERE/shim" -I"$INC" -I"$REF" \
    "$HERE/main.cpp" "$HERE/impl.cpp" \
    "$TMP/pathtracer_patched.cpp" "$TMP/mesh_patched.cpp" "$REF/image.cpp" \
    "$REF/pathutil.cpp" \
    -o "$OUT"
echo "built $OUT"
