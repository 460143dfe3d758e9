"""Round-4 factored-route decision run (one process, compile-once,
4 interleaved passes, min-over-pass2+ decision numbers).

Arms at 4096x8192 -> 8192x16384 half (the 8K big tier):
  Tn: production transform natural   (r2c_quad_staged, i16 codec)
  Tf: production transform factored  (factored=True)
  En: shipped e2e planes pipeline    (_pipeline planes_out)
  Ef: factored e2e                   (fac transform + fac CAS 64/1024)

The round-3 gate measured Ef 46.8 vs En 30.5 with the CAS at bt=32;
bd3804e fixed the strips lowering and the sweep now shows fac CAS
16.7-17.4 vs nat 9.6-10.1 at bt=64/wsb=1024 and a transform WASH in
production form (probe5's 5 ms win does not reproduce with the
correction terms + colsum in the program).  This script is the
decision record: if Ef - En stays >> 0 across passes, the factored
route is rejected with numbers and the dark kwargs shrink.
"""
import os
import sys
import time as _time

import jax
import numpy as np

sys.path.insert(0, ".")
import functools

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops import cas_pallas
from vkresample_tpu.pipeline.bench_util import make_looped
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 4096, 8192
SHARPEN = 0.2
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=3,
)
banks = make_device_banks(plan, Engine.MXU)
n1, n2 = staged.factored_split(banks)
prec = staged.staged_precision()
codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
rng = np.random.default_rng(0)
img_hwc = rng.integers(0, 256, (h, w, 3), np.uint8)
x_chw = jax.device_put(np.moveaxis(img_hwc, -1, 0).copy())
x_hwc = jax.device_put(img_hwc)


def tf_nat(xx, bb):
    return staged.r2c_quad_staged(xx, bb, prec, **codec)


def tf_fac(xx, bb):
    return staged.r2c_quad_staged(xx, bb, prec, factored=True, **codec)


def e2e_nat(xx, bb):
    return _pipeline(xx, bb, plan=plan, engine=Engine.MXU, planes_out=True)


def e2e_fac(xx, bb):
    Ps = staged.r2c_quad_staged(xx, bb, prec, factored=True, **codec)
    return cas_pallas.cas_parity4_planes_u2(*Ps, SHARPEN, fac_split=(n1, n2))


def prep(fn, x0, name):
    run = make_looped(fn)
    t0 = _time.perf_counter()
    int(run(x0, banks, 2))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x0, banks, k))
        return _time.perf_counter() - t0

    return measure


ARMS = []
for name, fn, x0, bt, wsb in [
    ("Tn", tf_nat, x_chw, 0, 0),
    ("Tf", tf_fac, x_chw, 0, 0),
    ("En", e2e_nat, x_hwc, 0, 0),
    ("Ef", e2e_fac, x_chw, 64, 1024),
]:
    os.environ["VKRESAMPLE_QUAD_BT"] = str(bt)
    os.environ["VKRESAMPLE_QUAD_WSB"] = str(wsb)
    try:
        ARMS.append((name, prep(fn, x0, name)))
    except Exception as e:
        print(f"{name} COMPILE FAILED: {str(e)[:200]}", flush=True)
os.environ["VKRESAMPLE_QUAD_BT"] = "0"
os.environ["VKRESAMPLE_QUAD_WSB"] = "0"

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
