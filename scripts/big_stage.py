"""Stage split at the >8K geometry (4096x8192 -> 8192x16384 half):
transform-only (uint8 -> 4 i16 planes via the int8 dense quad route) vs
the full pipeline — locates the remaining headroom (est. floor ~15-20 ms
vs the 65 ms measured; suspects: int8 digit-combine traffic at ~2 ms per
full-size pass, and the strip CAS kernel parameters).
Also sweeps quad strip CAS params on pre-made planes.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.core import tuning
from vkresample_tpu.fft import dense
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 4096, 8192
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO)
banks = make_device_banks(plan, Engine.MXU)
assert banks is not None and "xq_d1" in banks
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
CODEC = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)


def transform_only(xx, bb):
    xr = jnp.moveaxis(xx, -1, -3)
    return dense.r2c_quad(xr, bb, HIGH, **CODEC)


def x_only(xx, bb):
    xr = jnp.moveaxis(xx, -1, -3)
    return dense.r2c_quad(xr, bb, HIGH, **CODEC)[:2]


full = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=True, planar_out=True
)

for name, fn in [("x stage", x_only), ("transform", transform_only), ("full", full)]:
    ms = time_device(fn, x, aux=banks, k1=2, k2=8, reps=2)
    print(f"{name:12s} {ms:9.3f} ms", flush=True)

Ps = jax.block_until_ready(jax.jit(transform_only)(x, banks))

import dataclasses  # noqa: E402

_base = tuning.current()
for wsb in (1024, 2048, 512):
    tuning.current = lambda _w=wsb: dataclasses.replace(_base, quad_wsb=_w)

    def fn(p0, aux):
        p1, p2, p3 = aux
        return cas_parity4_planes_u2(p0, p1, p2, p3, 0.2, block_rows=32)

    try:
        ms = time_device(fn, Ps[0], aux=Ps[1:], k1=2, k2=8, reps=2)
        print(f"CAS wsb={wsb:4d} {ms:9.3f} ms", flush=True)
    except Exception as e:
        print(f"CAS wsb={wsb:4d} FAILED: {str(e)[:140]}", flush=True)
