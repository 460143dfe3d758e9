"""Dump the optimized HLO of the flagship pipeline and summarize each
named fusion (for joining against scripts/profile_flagship.py's
per-fusion timings): root instruction, shapes, and any dot/convert ops
inside.  Compile-only — pairs with a prior profile run's op names.
"""
import functools
import re
import sys

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

txt = pipe.lower(x, banks).compile().as_text()
with open("/tmp/flagship_hlo.txt", "w") as f:
    f.write(txt)
print(f"HLO: {len(txt)} chars -> /tmp/flagship_hlo.txt", flush=True)

# summarize each fusion computation: name, root line, dots inside
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

# ENTRY: list fusion instructions with their computation + output shape
print("\n== ENTRY fusion instructions ==")
for line in blocks.get("ENTRY", []):
    m = re.search(r"%?(fusion[\w.]*)\s*=\s*(\S+)\s+fusion\(.*calls=%?([\w.]+)", line)
    if m:
        name, shape, comp = m.groups()
        body = blocks.get(comp, [])
        dots = [l.strip()[:140] for l in body if " dot(" in l]
        kinds = {}
        for l in body:
            km = re.search(r"=\s*\S+\s+([a-z-]+)\(", l)
            if km:
                kinds[km.group(1)] = kinds.get(km.group(1), 0) + 1
        top = sorted(kinds.items(), key=lambda kv: -kv[1])[:6]
        print(f"\n{name}: out={shape} comp={comp} ops={top}")
        for d in dots[:4]:
            print(f"    {d}")
for line in blocks.get("ENTRY", []):
    if "custom-call" in line:
        print("\nCC:", line.strip()[:200])
