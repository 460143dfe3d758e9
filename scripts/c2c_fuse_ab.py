"""Round-4 c2c magnitude-fusion A/B at the bigc2c tier (4096x8192 -c2c
2x half -> 8192x16384), one process, compile-once, 4 interleaved
passes, min-over-pass2+ decision numbers.

Target: the round-4 bigc2c HLO attribution found ~7.7 ms of
magnitude-pass overhead in the 30.9 ms program — reshape.72/73
(2.45 ms materialized f32 dequant/flatten), copy.49/42 (2.38 ms f32
sublane-transpose copies of the y-conv S3 outputs), and
clamp_convert_fusion (2.78 ms separate 3-plane magnitude+i16-encode
pass).  The fused form computes the rank-1 magnitude + i16 encode in
conv_apply_rows' pre-flatten 4D epilogue (the r2c DC-fuse pattern) and
defers the x-plane decode into the y convs' row-split view (dqlate).

Arms:
  LEG: VKRESAMPLE_C2C_FUSE=0 (round-3 shipped path)
  FUS: fused epilogue (new default)

Also prints plane maxdiff FUS vs LEG (expected <=1: the ry=0
magnitudes move pre-codec, a <=0.008 u8 LSB shift).
"""
import os
import sys
import time as _time

import jax
import numpy as np

sys.path.insert(0, ".")

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.bench_util import make_looped
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, sharpen=0.2,
    r2c=False, engine=Engine.AUTO,
)
eng = plan.resolve_engine()
banks = make_device_banks(plan, eng, planes=True)
rng = np.random.default_rng(0)
x = jax.device_put(rng.integers(0, 256, (h, w, 3), np.uint8))


def make_e2e():
    # fresh closure per arm: the jit cpp cache ignores env changes
    def e2e(xx, _):
        return _pipeline(xx, banks, plan=plan, engine=eng, planes_out=True)

    return e2e


def prep(name):
    run = make_looped(make_e2e())
    t0 = _time.perf_counter()
    int(run(x, 0, 2))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x, 0, k))
        return _time.perf_counter() - t0

    return measure


ARMS = []
for name, fuse in [("LEG", "0"), ("FUS", "1")]:
    os.environ["VKRESAMPLE_C2C_FUSE"] = fuse
    try:
        ARMS.append((name, prep(name)))
    except Exception as e:
        print(f"{name} COMPILE FAILED: {str(e)[:300]}", flush=True)

# correctness: FUS vs LEG planes
os.environ["VKRESAMPLE_C2C_FUSE"] = "0"
pl_ = jax.jit(make_e2e())(x, 0)
os.environ["VKRESAMPLE_C2C_FUSE"] = "1"
pf = jax.jit(make_e2e())(x, 0)
md = max(
    int(np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16)).max())
    for a, b in zip(
        jax.tree_util.tree_leaves(pl_), jax.tree_util.tree_leaves(pf)
    )
)
print(f"planes maxdiff FUS vs LEG: {md}", flush=True)
os.environ.pop("VKRESAMPLE_C2C_FUSE", None)

quot = {name: [] for name, _ in ARMS}
for rnd in (1, 2, 3, 4):
    for name, m in ARMS:
        t1, t2 = m(2), m(8)
        ms = max(t2 - t1, 1e-9) * 1000.0 / 6
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} {name} {ms:8.3f} ms", flush=True)

for name, _ in ARMS:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 6
        print(f"DECIDE {name} {ms:8.3f} ms (min-over-pass2+)", flush=True)
