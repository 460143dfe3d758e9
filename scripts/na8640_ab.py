"""Round-5 na8640 misalignment-tax A/B: CAS pad target x x-split, one
process, compile-once, 4 interleaved passes, min-over-pass2+ decisions.

Target: the ~18 ms excess of the 73.4 ms 8640x8640 -> 17280x17280
program vs 2.22x the aligned big tier (round-5 profile_tier
attribution): CAS 24.2 ms (expected ~19.7 — the minimal lane pad
4320->4352 = 2^8*17 admits only Wsb=256, 2.0x column-halo reads),
replicate pads 5.5 ms, boundary copies 12.4 ms (expected ~7.1, the
n1=120 views).

Arms at 8640x8640 -> 17280x17280 half, e2e planes:
  Emin : pad target = minimal 128-multiple (round-5 pre-fix shipped)
  Egeo : pad target = _lane_pad_target (4480 -> Wsb=896, 1.29x halo)
  E240 : Egeo + VKRESAMPLE_XSPLIT=240 (n2=36; n1=240 pads 16/240 per
         view like 120, but halves the n2-side boundary views)
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

h, w = 8640, 8640
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=3,
)
rng = np.random.default_rng(0)
img_hwc = rng.integers(0, 256, (h, w, 3), np.uint8)
x_hwc = jax.device_put(img_hwc)

BANKS = {}
for xs in (None, "240"):
    if xs:
        os.environ["VKRESAMPLE_XSPLIT"] = xs
    else:
        os.environ.pop("VKRESAMPLE_XSPLIT", None)
    BANKS[xs] = make_device_banks(plan, Engine.MXU)
    print(f"banks xsplit={xs or 'default'} built", flush=True)
os.environ.pop("VKRESAMPLE_XSPLIT", None)


def make_e2e(xs):
    bb = BANKS[xs]

    def e2e(xx, _):
        return _pipeline(xx, bb, plan=plan, engine=Engine.MXU, planes_out=True)

    return e2e


def prep(fn, x0, name):
    run = make_looped(fn)
    t0 = _time.perf_counter()
    int(run(x0, 0, 2))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x0, 0, k))
        return _time.perf_counter() - t0

    return measure


ARMS = []
for name, xs, padt in [
    ("Emin", None, "min"),
    ("Egeo", None, None),
    ("E240", "240", None),
]:
    if padt:
        os.environ["VKRESAMPLE_PAD_TARGET"] = padt
    else:
        os.environ.pop("VKRESAMPLE_PAD_TARGET", None)
    try:
        ARMS.append((name, prep(make_e2e(xs), x_hwc, name)))
    except Exception as e:
        print(f"{name} COMPILE FAILED: {str(e)[:300]}", flush=True)
os.environ.pop("VKRESAMPLE_PAD_TARGET", None)

# correctness: Egeo and E240 planes vs Emin
os.environ["VKRESAMPLE_PAD_TARGET"] = "min"
pmin = jax.jit(make_e2e(None))(x_hwc, 0)
del os.environ["VKRESAMPLE_PAD_TARGET"]
for nm, xs in (("Egeo", None), ("E240", "240")):
    pv = jax.jit(make_e2e(xs))(x_hwc, 0)
    md = max(
        int(np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(pmin), jax.tree_util.tree_leaves(pv)
        )
    )
    print(f"planes maxdiff {nm} vs Emin: {md}", flush=True)

quot = {name: [] for name, _ in ARMS}
for rnd in (1, 2, 3, 4):
    for name, m in ARMS:
        t1, t2 = m(2), m(6)
        ms = max(t2 - t1, 1e-9) * 1000.0 / 4
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} {name} {ms:8.3f} ms", flush=True)

for name, _ in ARMS:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 4
        print(f"DECIDE {name} {ms:8.3f} ms (min-over-pass2+)", flush=True)
