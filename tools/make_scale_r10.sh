#!/bin/sh
# Assemble SCALE_r10.json from the round-10 constant-density probe
# logs (BOTH scales re-measured this round with the footer-gated
# parallelism floor — the r9 sf3 log measured the retired 1-core-map
# plan and must not be mixed in).
# Usage: sh tools/make_scale_r10.sh [extra_sf3_log,...] [extra_sf10_log,...]
set -e
cd "$(dirname "$0")/.."
LO="/tmp/scale_r10_sf3_run2.log${1:+,$1}"
HI="/tmp/scale_r10_sf10_run4.log${2:+,$2}"
python tools/scale_probe.py \
  --lo "sf3.0_density=$LO" \
  --hi "sf10.0_density=$HI" \
  --step 3.333 --out SCALE_r10.json \
  --lo-dir .localdata/sf3.0-density --hi-dir .localdata/sf10.0-density \
  --carries-forward "SCALE_r6.json (full 137-query 10x record), SCALE_r7.json (worst-4 third decade), SCALE_r8.json (bounded-twin 10x/30x), SCALE_r9.json (sf3-density minima + sign-LSH model/cap instrumentation, retired 1-core-map plan)"
