#!/bin/sh
# Assemble SCALE_r11.json from the round-11 constant-density probe
# logs: the sf3 re-measure of the REGISTERED (post-restrict_ids)
# q_sim_pairs_lsh plan plus the sf10-density run the round-10 artifact
# left "in flight".
# Usage: sh tools/make_scale_r11.sh [extra_sf3_log,...] [extra_sf10_log,...]
set -e
cd "$(dirname "$0")/.."
LO="/tmp/scale_r11_sf3_run1.log${1:+,$1}"
HI="/tmp/scale_r11_sf10_run1.log${2:+,$2}"
python tools/scale_probe.py \
  --lo "sf3.0_density=$LO" \
  --hi "sf10.0_density=$HI" \
  --step 3.333 --out SCALE_r11.json \
  --lo-dir .localdata/sf3.0-density --hi-dir .localdata/sf10.0-density \
  --carries-forward "SCALE_r6.json (full 137-query 10x record), SCALE_r7.json (worst-4 third decade), SCALE_r8.json (bounded-twin 10x/30x), SCALE_r9.json (sf3-density minima, retired 1-core-map plan), SCALE_r10.json (post-fix sf3-density re-measures; plan-defect diagnosis)"
