#!/usr/bin/env bash
# Build a self-contained wheel (reference build.sh + maturin packaging →
# a plain Python wheel; the C++ library self-compiles at import via g++).
#
# Usage: scripts/build_wheel.sh [outdir]   (default: dist/)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist}"

# ship the native source inside the package so installed wheels can
# self-compile it (vllm_rs_tpu/native.py searches vllm_rs_tpu/csrc too)
rm -rf vllm_rs_tpu/csrc
cp -r csrc vllm_rs_tpu/csrc
trap 'rm -rf vllm_rs_tpu/csrc' EXIT

if python -c "import build" 2>/dev/null; then
  # --no-isolation: works offline (setuptools already present)
  python -m build --wheel --no-isolation --outdir "$OUT"
else
  pip wheel --no-deps --no-build-isolation --wheel-dir "$OUT" .
fi
ls -la "$OUT"/*.whl
