#!/usr/bin/env bash
# Fetch the standard NeRF LLFF example captures (incl. fern) into ./data.
# Mirrors the reference release's data bootstrap; requires network access.
set -euo pipefail
mkdir -p data
cd data
URL="https://people.eecs.berkeley.edu/~bmild/nerf/nerf_example_data.zip"
echo "Downloading ${URL} ..."
curl -L -o nerf_example_data.zip "${URL}" || wget -O nerf_example_data.zip "${URL}"
unzip -o nerf_example_data.zip
echo "Fern scene at: data/nerf_llff_data/fern"
echo "NOTE: the infer/eval path additionally needs COLMAP sparse output at"
echo "      <scene>/sparse/0/{images.bin,points3D.bin} (run COLMAP SfM)."
