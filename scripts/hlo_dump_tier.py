"""Dump the optimized HLO of any bench.py tier and summarize the
copy/reshape/fusion instructions (for joining against
scripts/profile_tier.py's per-op timings).  Compile-only.

Usage: python scripts/hlo_dump_tier.py {flagship|big|bigfrac|bigc2c|big16k|grid|na8640}
"""
import functools
import re
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

TIERS = {
    "flagship": (dict(h=1024, w=2048, upscale=2.0), (1024, 2048, 3)),
    "big": (dict(h=4096, w=8192, upscale=2.0), (4096, 8192, 3)),
    "bigfrac": (dict(h=4608, w=6144, upscale=1.5), (4608, 6144, 3)),
    "bigc2c": (dict(h=4096, w=8192, upscale=2.0, r2c=False), (4096, 8192, 3)),
    "big16k": (
        dict(h=8192, w=16384, upscale=2.0, channels=3), (8192, 16384, 3),
    ),
    "grid": (dict(h=2048, w=4096, upscale=3.0), (2048, 4096, 3)),
    "na8640": (dict(h=8640, w=8640, upscale=2.0), (8640, 8640, 3)),
}

tier = sys.argv[1] if len(sys.argv) > 1 else "big"
kw, shape = TIERS[tier]
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

txt = pipe.lower(x, banks).compile().as_text()
path = f"/tmp/{tier}_hlo.txt"
with open(path, "w") as f:
    f.write(txt)
print(f"HLO: {len(txt)} chars -> {path}", flush=True)

blocks = {}
cur = None
for line in txt.splitlines():
    m = re.match(r"^%?(fused_[\w.]+|[\w.]+_fusion[\w.]*)\s.*\{", line)
    if line.startswith("ENTRY"):
        cur = "ENTRY"
        blocks[cur] = []
    elif m:
        cur = m.group(1)
        blocks[cur] = []
    elif cur is not None:
        blocks[cur].append(line)

print("\n== ENTRY copies / reshapes / bitcasts-with-layout ==")
for line in blocks.get("ENTRY", []):
    m = re.search(
        r"%?((?:copy|reshape|transpose)[\w.]*)\s*=\s*(\S+)\s+"
        r"(copy|reshape|transpose)\(%?([\w.]+)", line
    )
    if m:
        name, shp, kind, opnd = m.groups()
        print(f"{name}: {kind} -> {shp}  (operand {opnd})")

print("\n== ENTRY fusion instructions ==")
for line in blocks.get("ENTRY", []):
    m = re.search(
        r"%?((?:[\w.]+_fusion[\w.]*|fusion[\w.]*))\s*=\s*(\S+)\s+fusion\("
        r".*calls=%?([\w.]+)", line
    )
    if m:
        name, shp, comp = m.groups()
        body = blocks.get(comp, [])
        dots = [l.strip()[:130] for l in body if " dot(" in l]
        kinds = {}
        for l in body:
            km = re.search(r"=\s*\S+\s+([a-z-]+)\(", l)
            if km:
                kinds[km.group(1)] = kinds.get(km.group(1), 0) + 1
        top = sorted(kinds.items(), key=lambda kv: -kv[1])[:6]
        print(f"\n{name}: out={shp} comp={comp} ops={top}")
        for d in dots[:3]:
            print(f"    {d}")
for line in blocks.get("ENTRY", []):
    if "custom-call" in line:
        print("\nCC:", line.strip()[:200])
