#!/bin/bash
# Round-3 session-3 on-chip validation queue — run ONE AT A TIME on the
# real TPU (concurrent TPU processes crash the worker).  Logs land next
# to this script's invocation dir.  Budget: ~60-90 min total.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/onchip_r3}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$LOG/queue.log"
  timeout 3000 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? ($(date))" | tee -a "$LOG/queue.log"
}

# 0. small smoke (fast compile, confirms the tunnel is usable)
mkdir -p /tmp/vkrtest
python - << 'EOF'
from PIL import Image
import numpy as np
Image.fromarray((np.random.default_rng(7).random((48,64,3))*255).astype('uint8'),'RGB').save('/tmp/vkrtest/in.png')
img = np.random.default_rng(11).integers(0,256,(4608,6144,3),dtype='uint8')
Image.fromarray(img.astype('uint8'),'RGB').save('/tmp/vkrtest/bigfrac_in.png')
img = np.random.default_rng(12).integers(0,256,(512,9216,3),dtype='uint8')
Image.fromarray(img.astype('uint8'),'RGB').save('/tmp/vkrtest/bigc2c_in.png')
EOF
run smoke vkresample -i /tmp/vkrtest/in.png -o /tmp/vkrtest/out.png -u 2 -n 2

# 1. c2c route A/B at flagship (grid vs dense; oracle pin + 3 passes)
run c2c_ab python scripts/c2c_route_ab.py

# 1b. small fractional route A/B (grid opt-in vs dense big-spectrum)
run frac_ab python scripts/frac_route_ab.py

# 2. big FRACTIONAL tier validate: 4608x6144 -u 1.5 -> 6912x9216
run bigfrac vkresample -i /tmp/vkrtest/bigfrac_in.png \
  -o /tmp/vkrtest/bigfrac_out.png -u 1.5 -p 2 -validate

# 3. big c2c validate (short frame keeps the fp64 oracle cheap):
#    512x9216 -c2c 2x -> 1024x18432
run bigc2c vkresample -i /tmp/vkrtest/bigc2c_in.png \
  -o /tmp/vkrtest/bigc2c_out.png -u 2 -c2c -p 2 -validate

# 3b. convolution engines incl. the separable fused path
run conv_bench python scripts/conv_bench.py

# 4. officials (one process each; flagship + all big-tier fields)
run bench_flagship python bench.py
run bench_big python bench.py --big --grid --bigfrac --bigc2c

echo "QUEUE DONE ($(date))" | tee -a "$LOG/queue.log"
