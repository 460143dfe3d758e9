"""Record the 3-channel 16K->32K user-surface number (verdict item 2).

8192x16384 -> 16384x32768 half, planes_out — the CLI frame.  Arms:
  b1: 1-channel batched   (the round-3 recorded configuration, 43.2 ms)
  b3: 3-channel batched   (C-leading batch dim; ~1.6e9 output elements —
      may exceed HBM; compile/alloc failure is caught and recorded)
  s3: 3-channel channel-serial (lax.map body, the new default route at
      this size: pipeline/upscale.py _channel_serial)

Same process, compile-once, interleaved passes, min-over-pass2+.
"""
import os
import sys
import time as _time

import functools

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.bench_util import make_looped
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 8192, 16384
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (h, w, 3), np.uint8)

plan3 = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=3,
)
plan1 = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=1,
)
banks = make_device_banks(plan3, Engine.MXU)
x3 = jax.device_put(img)
x1 = jax.device_put(img[:, :, :1].copy())


def mk(plan, serial):
    def f(xx, bb):
        os.environ["VKRESAMPLE_CHANNEL_SERIAL"] = serial
        try:
            return _pipeline(
                xx, bb, plan=plan, engine=Engine.MXU, planes_out=True
            )
        finally:
            os.environ.pop("VKRESAMPLE_CHANNEL_SERIAL", None)

    return f


def prep(fn, x0, name):
    run = make_looped(fn)
    t0 = _time.perf_counter()
    int(run(x0, banks, 1))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x0, banks, k))
        return _time.perf_counter() - t0

    return measure


ARMS = []
for name, plan, x0, serial in [
    ("b1", plan1, x1, "0"),
    ("s3", plan3, x3, "1"),
    ("b3", plan3, x3, "0"),
]:
    try:
        ARMS.append((name, prep(mk(plan, serial), x0, name)))
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:300]}", flush=True)

quot = {name: [] for name, _ in ARMS}
for rnd in (1, 2, 3):
    for name, m in ARMS:
        try:
            t1, t2 = m(1), m(4)
        except Exception as e:
            print(f"pass{rnd} {name} RUN FAILED: {str(e)[:200]}", flush=True)
            continue
        ms = max(t2 - t1, 1e-9) * 1000.0 / 3
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} {name} {ms:8.3f} ms", flush=True)

for name, _ in ARMS:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 3
        print(f"DECIDE {name} {ms:8.3f} ms (min-over-pass2+)", flush=True)

# correctness: channel-serial plane 0 must match the 1-channel batched
# program's output on the same channel data
o1 = jax.jit(
    functools.partial(
        _pipeline, plan=plan1, engine=Engine.MXU, planes_out=True
    )
)(x1, banks)
os.environ["VKRESAMPLE_CHANNEL_SERIAL"] = "1"
o3 = jax.jit(mk(plan3, "1"))(x3, banks)
os.environ.pop("VKRESAMPLE_CHANNEL_SERIAL", None)
d = max(
    int(
        np.abs(
            np.asarray(a[..., 0, :, :], np.int32)
            - np.asarray(b[..., 0, :, :], np.int32)
        ).max()
    )
    for a, b in zip(o1, o3)
)
print(f"maxdiff serial-3ch[ch0] vs batched-1ch: {d}", flush=True)
