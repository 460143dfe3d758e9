"""Round-4 flagship (verdict item 7) experiment: the dense quad y
transform runs its 5 int8 digit dots once per plane (10 MXU dispatches,
0.37 ms of the 1.22 ms flagship program, round-4 profile).  Arm B
stacks the two planes on a leading batch dim so each digit dot runs
once, batched (VKRESAMPLE_DENSE_YBATCH=1) at the cost of a 12.6 MB i16
stack copy.  One process, 4 interleaved passes, min-over-pass2+.
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

h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=3,
)
banks = make_device_banks(plan, Engine.MXU)
rng = np.random.default_rng(0)
x_hwc = jax.device_put(rng.integers(0, 256, (h, w, 3), np.uint8))


def mk():
    def e2e(xx, bb):
        return _pipeline(xx, bb, plan=plan, engine=Engine.MXU, planes_out=True)

    return e2e


def prep(name):
    fn = mk()
    run = make_looped(fn)
    t0 = _time.perf_counter()
    int(run(x_hwc, banks, 4))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)
    out = [np.asarray(p) for p in jax.tree_util.tree_leaves(jax.jit(fn)(x_hwc, banks))]

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x_hwc, banks, k))
        return _time.perf_counter() - t0

    return measure, out


ARMS = []
outs = {}
for name, env in [("ship  ", None), ("ybatch", "1")]:
    if env:
        os.environ["VKRESAMPLE_DENSE_YBATCH"] = env
    else:
        os.environ.pop("VKRESAMPLE_DENSE_YBATCH", None)
    m, o = prep(name)
    ARMS.append((name, m))
    outs[name] = o
os.environ.pop("VKRESAMPLE_DENSE_YBATCH", None)

md = max(
    int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
    for a, b in zip(outs["ship  "], outs["ybatch"])
)
print(f"planes maxdiff ybatch vs ship: {md} (expect 0 — same dots)", flush=True)

quot = {name: [] for name, _ in ARMS}
for rnd in (1, 2, 3, 4):
    for name, m in ARMS:
        t1, t2 = m(8), m(40)
        ms = max(t2 - t1, 1e-9) * 1000.0 / 32
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} {name} {ms:8.4f} ms", flush=True)

for name, _ in ARMS:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 32
        print(f"DECIDE {name} {ms:8.4f} ms (min-over-pass2+)", flush=True)
