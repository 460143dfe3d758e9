"""Op-level device-time attribution for any bench.py tier.

Usage: python scripts/profile_tier.py {flagship|big|bigfrac|bigc2c|big16k|grid|na8640}

Builds the EXACT plan bench.py uses for that tier (planes_out=True on
the big tiers), traces 8-20 device executions with jax.profiler, and
prints total device time per XLA op — the same method as
scripts/profile_flagship.py (whose stage attribution found the 5.8 ms
of pure copies harvested by the round-4 layout fixes at 8K).
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
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

TIERS = {
    # name -> (plan kwargs, input shape, trace iters)
    "flagship": (dict(h=1024, w=2048, upscale=2.0), (1024, 2048, 3), 20),
    "big": (dict(h=4096, w=8192, upscale=2.0), (4096, 8192, 3), 8),
    "bigfrac": (dict(h=4608, w=6144, upscale=1.5), (4608, 6144, 3), 8),
    "bigc2c": (
        dict(h=4096, w=8192, upscale=2.0, r2c=False), (4096, 8192, 3), 8,
    ),
    "big16k": (
        dict(h=8192, w=16384, upscale=2.0, channels=3), (8192, 16384, 3), 4,
    ),
    "grid": (dict(h=2048, w=4096, upscale=3.0), (2048, 4096, 3), 8),
    # round-5 non-128-aligned 7-smooth tier (n1=120 x-split + replicate-
    # pad CAS) — attribution target: the ~1.26x per-pixel tax vs "big"
    "na8640": (dict(h=8640, w=8640, upscale=2.0), (8640, 8640, 3), 4),
}

tier = sys.argv[1] if len(sys.argv) > 1 else "flagship"
kw, shape, iters = TIERS[tier]
plan = UpscalePlan(
    precision=Precision.HALF, sharpen=0.2, engine=Engine.AUTO, **kw
)
engine = plan.resolve_engine()
banks = make_device_banks(plan, engine, planes=True)
pipe = jax.jit(functools.partial(
    _pipeline, plan=plan, engine=engine, planes_out=True
))
img = np.random.default_rng(0).integers(0, 256, shape, np.uint8)
x = jax.device_put(img)

for _ in range(3):
    out = jax.block_until_ready(pipe(x, banks))

TDIR = f"/tmp/vkr_profile_{tier}"
os.system(f"rm -rf {TDIR}")
with jax.profiler.trace(TDIR):
    for _ in range(iters):
        out = jax.block_until_ready(pipe(x, banks))

files = glob.glob(f"{TDIR}/**/*trace.json.gz", recursive=True)
if not files:
    print("NO TRACE FILE FOUND:", glob.glob(f"{TDIR}/**", recursive=True))
    sys.exit(1)
with gzip.open(files[0], "rt") as f:
    trace = json.load(f)

events = [
    e for e in trace.get("traceEvents", [])
    if e.get("ph") == "X" and "dur" in e and e.get("name")
]
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
print(f"[{tier}] total device-event time: {gsum / 1e3 / iters:.3f} ms/iter"
      f" ({iters} iters)")
for name, us in items[:45]:
    print(f"{us / 1e3 / iters:9.4f} ms  x{cnt[name] // iters:<4d} {name[:110]}")
