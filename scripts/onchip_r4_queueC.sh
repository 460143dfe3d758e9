#!/bin/bash
# Round-4 on-chip queue C — attribution + officials.  ONE AT A TIME.
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

# 1. flagship HLO fusion dump (joins the queue-B profile's fusion names)
run hlo_flagship python scripts/hlo_dump_flagship.py
cp /tmp/flagship_hlo.txt "$LOG/flagship_hlo.txt" 2>/dev/null

# 2. big-tier (8K->16K) op-level attribution + HLO pair
run profile_big python scripts/profile_flagship.py 4096 8192
run hlo_big python scripts/hlo_dump_flagship.py 4096 8192
cp /tmp/flagship_hlo.txt "$LOG/big_hlo.txt" 2>/dev/null

echo "QUEUE R4C DONE ($(date))" | tee -a "$LOG/queue.log"
