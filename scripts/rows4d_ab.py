"""Round-4 e2e A/B: transposed-row 4D P10/P11 (the S3 dot's copy-free
emission, consumed by the slot CAS kernel's e-slice DMAs at bt=nd) vs
the flat planes (VKRESAMPLE_ROWS4D=0) at 8K->16K half.  One process,
4 interleaved passes, min-over-pass2+.  Bit-exact (CPU tests pin both
halves); u8 outputs compared here too.

Target: copy.66/copy.52 (0.61 ms each at 8K) — the sublane transpose
XLA inserts to canonicalize the y S3 dots' stored outputs — plus
whatever share of reshape.54 rides the same layout chain.
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
for name, env in [("flat  ", "0"), ("rows4d", None)]:
    if env:
        os.environ["VKRESAMPLE_ROWS4D"] = env
    else:
        os.environ.pop("VKRESAMPLE_ROWS4D", None)
    m, o = prep(name)
    ARMS.append((name, m))
    outs[name] = o
os.environ.pop("VKRESAMPLE_ROWS4D", None)

md = max(
    int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
    for a, b in zip(outs["flat  "], outs["rows4d"])
)
print(f"planes maxdiff rows4d vs flat: {md} (expect 0)", flush=True)

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
