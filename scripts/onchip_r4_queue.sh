#!/bin/bash
# Round-4 on-chip queue — run ONE AT A TIME on the real TPU (concurrent
# TPU processes crash the worker).  Logs to $1 (default /tmp/onchip_r4).
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/onchip_r4}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$LOG/queue.log"
  timeout 3000 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? ($(date))" | tee -a "$LOG/queue.log"
}

# 1. factored-route decision A/B (verdict item 1): production transform
#    nat vs fac + e2e nat vs fac, compile-once, 4 interleaved passes
run fac_decide python scripts/fac_decide_ab.py

# 2. 3-channel 16K->32K user-surface number (verdict item 2):
#    batched-1ch vs serial-3ch vs batched-3ch
run big16k_3ch python scripts/big16k_3ch.py

# 3. exotic-fraction c2c grid above DENSE_MAX (verdict item 4): p=5 and
#    p=7 via the real CLI with the fp64 oracle cross-check.  Short frames
#    keep the oracle cheap; both outputs are 7-smooth (the reference
#    rejects p=11-style outputs outright, so p in {5,7} IS the exotic
#    class that can reach a user).
mkdir -p /tmp/vkrtest
python - << 'EOF'
from PIL import Image
import numpy as np
img = np.random.default_rng(21).integers(0, 256, (512, 8192, 3), dtype='uint8')
Image.fromarray(img, 'RGB').save('/tmp/vkrtest/bigexotic_in.png')
EOF
run bigexotic_p5 python -m vkresample_tpu -i /tmp/vkrtest/bigexotic_in.png \
  -o /tmp/vkrtest/bigexotic_p5.png -u 2.5 -c2c -p 2 -validate
run bigexotic_p7 python -m vkresample_tpu -i /tmp/vkrtest/bigexotic_in.png \
  -o /tmp/vkrtest/bigexotic_p7.png -u 1.75 -c2c -p 2 -validate

echo "QUEUE R4A DONE ($(date))" | tee -a "$LOG/queue.log"
