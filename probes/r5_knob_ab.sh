#!/bin/sh
# r5 knob A/B sequence (VERDICT r4 items 3/6): spp_unroll / chunk_unroll /
# spp_fuse on the headline mix (512^2 spp32 d5) and the config-5 mix
# (512^2 spp20 d3, the reference realtime demo's exact per-frame load).
# One TPU process at a time; one JSON line per run, appended to $OUT.
OUT=${1:-/tmp/r5_knob_ab.jsonl}
cd "$(dirname "$0")/.."
PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH
run() {
  echo "# $*" >> "$OUT"
  timeout 900 python probes/headline_ab.py "$@" >> "$OUT" 2>/dev/null \
    || echo '{"error": "timeout-or-crash"}' >> "$OUT"
}
# headline mix
run
run spp_unroll=2
run spp_unroll=4
run chunk_unroll=2
run spp_unroll=2 chunk_unroll=2
# config-5 mix (spp20 d3; spp_fuse=4 -> 5 groups of 1M rays = 2 chunks each)
run spp=20 max_depth=3
run spp=20 max_depth=3 spp_unroll=5
run spp=20 max_depth=3 chunk_unroll=2
run spp=20 max_depth=3 spp_unroll=5 chunk_unroll=2
run spp=20 max_depth=3 spp_fuse=10
run spp=20 max_depth=3 spp_fuse=20
run spp=20 max_depth=3 spp_fuse=20 chunk_unroll=10
echo "DONE" >> "$OUT"
