"""Round-4 e2e A/B: shipped (y convs read the dequantized i16 planes)
vs the f32y variant (y convs read the un-quantized f32 planes; stores
still feed CAS) at 8K->16K half — one process, 4 interleaved passes,
min-over-pass2+.

Motivation: after the xsplit/dc-fuse layout fixes the dequant+reshape
pass feeding the y convs is the largest remaining XLA relayout
(reshape.60 = 1.22 ms of the 25.0 ms pipeline, round-4 profile run 2).
f32y removes that read path entirely at the cost of keeping the f32
planes live alongside the i16 stores.  Oracle impact: the y convs see
MORE accurate inputs (no Q2.14 roundtrip), so the 1-LSB gate can only
tighten; plane diff vs shipped is printed.
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
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=3,
)
banks = make_device_banks(plan, Engine.MXU)
rng = np.random.default_rng(0)
img_hwc = rng.integers(0, 256, (h, w, 3), np.uint8)
x_hwc = jax.device_put(img_hwc)


def mk():
    def e2e(xx, bb):
        return _pipeline(xx, bb, plan=plan, engine=Engine.MXU, planes_out=True)

    return e2e


def prep(name):
    fn = mk()
    run = make_looped(fn)
    t0 = _time.perf_counter()
    int(run(x_hwc, banks, 2))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)
    out = jax.jit(fn)(x_hwc, banks)

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x_hwc, banks, k))
        return _time.perf_counter() - t0

    return measure, [np.asarray(p) for p in jax.tree_util.tree_leaves(out)]


ARMS = []
outs = {}
for name, env in [("ship", None), ("f32y", "f32y")]:
    if env:
        os.environ["VKRESAMPLE_STAGED_VARIANT"] = env
    else:
        os.environ.pop("VKRESAMPLE_STAGED_VARIANT", None)
    m, o = prep(name)
    ARMS.append((name, m))
    outs[name] = o
os.environ.pop("VKRESAMPLE_STAGED_VARIANT", None)

md = max(
    int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
    for a, b in zip(outs["ship"], outs["f32y"])
)
print(f"planes maxdiff f32y vs ship: {md}", flush=True)

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
