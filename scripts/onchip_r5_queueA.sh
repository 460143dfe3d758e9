#!/bin/bash
# Round-5 on-chip queue A — ONE AT A TIME on the real TPU (concurrent
# TPU processes crash the worker).  Logs to $1 (default /tmp/onchip_r5).
#
# Verdict item 3: the non-dyadic fractional grid (q=3) has never
# compiled on the real chip — validate one big r2c and one big c2c
# frame through the real CLI with the fp64 oracle cross-check.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/onchip_r5}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$LOG/queue.log"
  timeout 3000 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? ($(date))" | tee -a "$LOG/queue.log"
}

mkdir -p /tmp/vkrtest
python - << 'EOF'
from PIL import Image
import numpy as np
rng = np.random.default_rng(31)
img = rng.integers(0, 256, (9216, 3456, 3), dtype='uint8')
Image.fromarray(img, 'RGB').save('/tmp/vkrtest/q3_r2c_in.png')
img = rng.integers(0, 256, (9216, 1152, 3), dtype='uint8')
Image.fromarray(img, 'RGB').save('/tmp/vkrtest/q3_c2c_in.png')
EOF

# 1. r2c non-dyadic grid: 9216x3456 -u 4/3 -> 12288x4608 (16 planes of
#    3072x1152, q=3 decimated banks)
run q3_r2c python -m vkresample_tpu -i /tmp/vkrtest/q3_r2c_in.png \
  -o /tmp/vkrtest/q3_r2c_out.png -u 1.3333334 -p 2 -validate

# 2. c2c non-dyadic grid: 9216x1152 -u 4/3 -> 12288x1536
run q3_c2c python -m vkresample_tpu -i /tmp/vkrtest/q3_c2c_in.png \
  -o /tmp/vkrtest/q3_c2c_out.png -u 1.3333334 -c2c -p 2 -validate

echo "QUEUE R5A DONE ($(date))" | tee -a "$LOG/queue.log"
