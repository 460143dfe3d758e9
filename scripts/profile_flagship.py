"""Op-level profile of the flagship pipeline (the 'profile, iterate'
step): trace N device executions with jax.profiler, then parse the
trace.json.gz events and print total device time per op category.

The stage-split in bench.py --stages is DIFFERENTIAL across separate
compiles (noise-dominated at the 0.1 ms scale on this host); this reads
the XLA op timeline of the REAL composed program instead, so the
attribution inside one program is exact (modulo trace overhead).
"""
import functools
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.upscale import (
    _pipeline,
    make_device_banks,
    parity_planes_supported,
)

h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (1024, 2048)
u = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
plan = UpscalePlan(
    h=h, w=w, upscale=u, precision=Precision.HALF, sharpen=0.2,
    engine=Engine.AUTO,
)
engine = plan.resolve_engine()
planes = parity_planes_supported(plan)
pipe = jax.jit(functools.partial(
    _pipeline, plan=plan, engine=engine, planar_out=True, planes_out=planes
))
banks = make_device_banks(plan, engine)
img = np.random.default_rng(0).integers(0, 256, (h, w, 3), np.uint8)
x = jax.device_put(img)

# warm-up (compile + first runs)
for _ in range(3):
    out = jax.block_until_ready(pipe(x, banks))

TDIR = "/tmp/vkr_profile"
os.system(f"rm -rf {TDIR}")
with jax.profiler.trace(TDIR):
    for _ in range(20):
        out = jax.block_until_ready(pipe(x, banks))

files = glob.glob(f"{TDIR}/**/*trace.json.gz", recursive=True)
if not files:
    print("NO TRACE FILE FOUND; contents:", glob.glob(f"{TDIR}/**", recursive=True))
    sys.exit(1)
with gzip.open(files[0], "rt") as f:
    trace = json.load(f)

# device-lane complete events: sum wall duration by op name
events = [
    e for e in trace.get("traceEvents", [])
    if e.get("ph") == "X" and "dur" in e and e.get("name")
]
# keep only TPU device lanes (pid names containing 'TPU' / 'device')
pid_names = {}
for e in trace["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {
    p for p, n in pid_names.items()
    if "TPU" in n or "device" in n.lower() or "/device" in n
}
tot = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    if dev_pids and e["pid"] not in dev_pids:
        continue
    tot[e["name"]] += e["dur"]
    cnt[e["name"]] += 1
print("pids:", {p: n for p, n in pid_names.items()}, flush=True)
items = sorted(tot.items(), key=lambda kv: -kv[1])
gsum = sum(tot.values())
print(f"total device-event time: {gsum / 1e3 / 20:.3f} ms per iter (20 iters)")
for name, us in items[:40]:
    print(f"{us / 1e3 / 20:9.4f} ms  x{cnt[name] // 20:<4d} {name[:110]}")
