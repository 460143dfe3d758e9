#!/bin/bash
# Round-5 on-chip queue B — ONE AT A TIME on the real TPU.
#
# Verdict item 2 done-criterion: a big 7-smooth frame whose width is
# NOT 128-aligned (8640 = 2^6*3^3*5) must run the staged tier at a
# modest lane-padding tax — within ~2x of the aligned 8192 neighbor
# (25.4-26 ms) — instead of the ~7x phases cliff (189 ms).
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

mkdir -p /tmp/vkrtest
python - << 'EOF'
from PIL import Image
import numpy as np
import os
if not os.path.exists('/tmp/vkrtest/na8640_in.png'):
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (8640, 8640, 3), dtype='uint8')
    Image.fromarray(img, 'RGB').save('/tmp/vkrtest/na8640_in.png')
EOF

# non-aligned 7-smooth big frame: 8640x8640 -u 2 -> 17280x17280
run na8640 python -m vkresample_tpu -i /tmp/vkrtest/na8640_in.png \
  -o /tmp/vkrtest/na8640_out.png -u 2 -p 2 -validate

echo "QUEUE R5B DONE ($(date))" | tee -a "$LOG/queue.log"
