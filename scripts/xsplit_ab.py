"""Round-4 composed-layout A/B: x-conv split n1 (64 vs 128) x DC-term
form (scatter .at[].add vs fused post-S3 broadcast add), one process,
compile-once, 4 interleaved passes, min-over-pass2+ decision numbers.

Target: the 8.9 ms of pure copies/reshapes the round-4 HLO attribution
found in the 30.8 ms 8K->16K pipeline:
  - copy.69 + reshape.151 (3.75 ms): x->y boundary relayout — the x
    conv's (..., n2=128, n1=64) output view leaves every 128-lane vreg
    half-used; n1=128 makes input AND output views lane-exact.
  - copy.256/257 (2.5 ms): the y-conv S2 outputs relaid out by the
    dc_add scatter; the fused form adds dc_add[d, L] in S3's epilogue.

Arms at 4096x8192 -> 8192x16384 half:
  T64/T128: production transform (fused dc), xsplit 64 vs 128
  E00: e2e planes, xsplit=64,  dc=scatter   (round-3 shipped)
  E10: e2e planes, xsplit=128, dc=scatter
  E01: e2e planes, xsplit=64,  dc=fused
  E11: e2e planes, xsplit=128, dc=fused    (round-4 default)

Also prints plane maxdiff E11 vs E00 (expected ~0-1: dc reassociation
is ~1e-7 relative; the split change is exact modulo fp order).
"""
import os
import sys
import time as _time

import jax
import numpy as np

sys.path.insert(0, ".")

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import make_looped
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=3,
)
prec = staged.staged_precision()
codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
rng = np.random.default_rng(0)
img_hwc = rng.integers(0, 256, (h, w, 3), np.uint8)
x_chw = jax.device_put(np.moveaxis(img_hwc, -1, 0).copy())
x_hwc = jax.device_put(img_hwc)

BANKS = {}
for xs in ("64", "128"):
    os.environ["VKRESAMPLE_XSPLIT"] = xs
    BANKS[xs] = make_device_banks(plan, Engine.MXU)
    print(
        f"xsplit {xs}: stx split {staged.factored_split(BANKS[xs])}",
        flush=True,
    )
del os.environ["VKRESAMPLE_XSPLIT"]


def make_tf(xs):
    bb = BANKS[xs]

    def tf(xx, _):
        return staged.r2c_quad_staged(xx, bb, prec, **codec)

    return tf


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
for name, mk, x0, xs, dc in [
    ("T64 ", make_tf, x_chw, "64", "fused"),
    ("T128", make_tf, x_chw, "128", "fused"),
    ("E00 ", make_e2e, x_hwc, "64", "scatter"),
    ("E10 ", make_e2e, x_hwc, "128", "scatter"),
    ("E01 ", make_e2e, x_hwc, "64", "fused"),
    ("E11 ", make_e2e, x_hwc, "128", "fused"),
]:
    if dc == "scatter":
        os.environ["VKRESAMPLE_DC"] = "scatter"
    else:
        os.environ.pop("VKRESAMPLE_DC", None)
    try:
        ARMS.append((name, prep(mk(xs), x0, name)))
    except Exception as e:
        print(f"{name} COMPILE FAILED: {str(e)[:300]}", flush=True)
os.environ.pop("VKRESAMPLE_DC", None)

# correctness: E11 vs E00 planes
os.environ["VKRESAMPLE_DC"] = "scatter"
p00 = jax.jit(make_e2e("64"))(x_hwc, 0)
del os.environ["VKRESAMPLE_DC"]
p11 = jax.jit(make_e2e("128"))(x_hwc, 0)
md = max(
    int(np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16)).max())
    for a, b in zip(jax.tree_util.tree_leaves(p00), jax.tree_util.tree_leaves(p11))
)
print(f"planes maxdiff E11 vs E00: {md}", flush=True)

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
