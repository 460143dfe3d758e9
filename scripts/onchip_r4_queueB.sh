#!/bin/bash
# Round-4 on-chip queue B — ONE AT A TIME on the real TPU.
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

# 1. flagship op-level attribution (verdict item 7: where does the x
#    stage's non-matmul time go?)
run profile_flagship python scripts/profile_flagship.py

# 2. p=7 exotic c2c re-validate after the grid-CAS VMEM-budget fix
run bigexotic_p7b python -m vkresample_tpu -i /tmp/vkrtest/bigexotic_in.png \
  -o /tmp/vkrtest/bigexotic_p7.png -u 1.75 -c2c -p 2 -validate

# 3. p=5 re-check at its new within-budget geometry (Wsb 1024 -> 512)
run bigexotic_p5b python -m vkresample_tpu -i /tmp/vkrtest/bigexotic_in.png \
  -o /tmp/vkrtest/bigexotic_p5.png -u 2.5 -c2c -p 2 -validate

# 4. user-surface verify drive: small single image, device list, batched
mkdir -p /tmp/vkrtest/inp /tmp/vkrtest/outp
python - << 'EOF'
from PIL import Image
import numpy as np
rng = np.random.default_rng(7)
Image.fromarray((rng.random((48,64,3))*255).astype('uint8'),'RGB').save('/tmp/vkrtest/in.png')
for i in range(1, 5):
    img = rng.integers(0, 256, (96, 128, 3), dtype='uint8')
    Image.fromarray(img, 'RGB').save(f'/tmp/vkrtest/inp/{i:06d}.png')
EOF
run verify_single python -m vkresample_tpu -i /tmp/vkrtest/in.png \
  -o /tmp/vkrtest/out.png -u 2 -n 5 -validate
run verify_devices python -m vkresample_tpu -devices
run verify_batched python -m vkresample_tpu -ifolder /tmp/vkrtest/inp/ \
  -ofolder /tmp/vkrtest/outp/ -numfiles 4 -numthreads 2 -u 2 -p 2

echo "QUEUE R4B DONE ($(date))" | tee -a "$LOG/queue.log"
