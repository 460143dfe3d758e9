#!/bin/bash
# Round-3 follow-up queue: the CLI validate steps from onchip_r3_queue.sh,
# re-run via `python -m vkresample_tpu` (the bare `vkresample` console script
# exists only after a pip install, which this image never does).  One process
# at a time on the TPU.
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

run smoke python -m vkresample_tpu -i /tmp/vkrtest/in.png -o /tmp/vkrtest/out.png -u 2 -n 2

run bigfrac python -m vkresample_tpu -i /tmp/vkrtest/bigfrac_in.png \
  -o /tmp/vkrtest/bigfrac_out.png -u 1.5 -p 2 -validate

run bigc2c python -m vkresample_tpu -i /tmp/vkrtest/bigc2c_in.png \
  -o /tmp/vkrtest/bigc2c_out.png -u 2 -c2c -p 2 -validate

echo "QUEUE2 DONE ($(date))" | tee -a "$LOG/queue.log"

run int8_stack python scripts/int8_stack_ab.py
echo "QUEUE2B DONE ($(date))" | tee -a "$LOG/queue.log"
