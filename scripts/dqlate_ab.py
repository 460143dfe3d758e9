"""Round-4 e2e A/B: deferred Q2.14 decode (reshape the i16 planes into
the y conv's row-split view FIRST, dequantize as S1's fused operand —
the new default) vs the early decode (full-size dequant pass before the
reshape; VKRESAMPLE_STAGED_VARIANT=dqearly) at 8K->16K half.  One
process, 4 interleaved passes, min-over-pass2+.  Bit-exact by
construction (elementwise op commutes with reshape); asserted.

Target: reshape.60 (1.22 ms f32 relayout at 8K, round-4 profile 2) —
worst case the materialized relayout halves (i16 vs f32 bytes), best
case the dequant fuses into S1's read.
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
x_hwc = jax.device_put(rng.integers(0, 256, (h, w, 3), np.uint8))


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
    out = [
        np.asarray(p)
        for p in jax.tree_util.tree_leaves(jax.jit(fn)(x_hwc, banks))
    ]

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x_hwc, banks, k))
        return _time.perf_counter() - t0

    return measure, out


ARMS = []
outs = {}
for name, env in [("dqlate ", None), ("dqearly", "dqearly")]:
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
    for a, b in zip(outs["dqlate "], outs["dqearly"])
)
print(f"planes maxdiff dqlate vs dqearly: {md} (expect 0)", flush=True)

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
