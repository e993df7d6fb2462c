#!/bin/sh
# Assemble SCALE_r10.json once the sf10-density probe log exists.
# Usage: sh tools/make_scale_r10.sh [extra_sf3_log,...] [extra_sf10_log,...]
# The optional extra logs (e.g. the q_sim_pairs_ivf subset probes) are
# min-merged into their scale by tools/scale_probe.py's merged().
set -e
cd "$(dirname "$0")/.."
LO=".localdata/scale_r9_sf3_run1.log${1:+,$1}"
HI="/tmp/scale_r10_sf10_run1.log${2:+,$2}"
python tools/scale_probe.py \
  --lo "sf3.0_density=$LO" \
  --hi "sf10.0_density=$HI" \
  --step 3.333 --out SCALE_r10.json \
  --lo-dir .localdata/sf3.0-density --hi-dir .localdata/sf10.0-density \
  --carries-forward "SCALE_r6.json (full 137-query 10x record), SCALE_r7.json (worst-4 third decade), SCALE_r8.json (bounded-twin 10x/30x), SCALE_r9.json (sf3-density minima + sign-LSH model/cap instrumentation)"
