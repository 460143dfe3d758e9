#!/bin/bash
# Round-5 on-chip queue C — ONE AT A TIME on the real TPU.
#
# 1. i16 inter-stage spectral codec re-A/B at the round-4/5 layout
#    (VERDICT r4 ask #1, the top ask): scripts/i16mid_ab2.py —
#    f32 / i16-both / i16-S1->S2-only / i16-S2->S3-only, interleaved
#    3-pass, 8K->16K 3ch transform + pipeline.
# 2. CAS extremes-tree A/B (ask #7): scripts/cas_tree_ab.py —
#    f32 vs native-i32 (vs i16, expected to fail compile on v5e),
#    flagship quad + big strip shapes, interleaved 3-pass.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/onchip_r5}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$LOG/queue.log"
  timeout 5400 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? ($(date))" | tee -a "$LOG/queue.log"
}

run i16mid python scripts/i16mid_ab2.py
run castree python scripts/cas_tree_ab.py

echo "QUEUE R5C DONE ($(date))" | tee -a "$LOG/queue.log"
