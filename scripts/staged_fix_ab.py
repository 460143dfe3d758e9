"""Same-process A/B of the staged composition variants at the big
geometry (4096x8192 -> 8192x16384): the staged_gap.py bisect showed the
second y conv costs ~2x its isolated time in the composed transform
(~10 ms gap).  Candidate fixes (VKRESAMPLE_STAGED_VARIANT):
batchy (one stacked y conv), f32y (skip dequant roundtrip), barrier
(pin fusion boundaries), and combinations.  Times the full transform
AND the full pipeline per variant.
"""
import functools
import os
import sys

import jax
import numpy as np
from jax import numpy as jnp

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

HI = jax.lax.Precision.HIGHEST
h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
banks = make_device_banks(plan, Engine.MXU)
assert banks is not None and "stx_b1" in banks
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)


def transform(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    return staged.r2c_quad_staged(xr, bb, HI, **codec)


pipe = functools.partial(_pipeline, plan=plan, engine=Engine.MXU, planes_out=True)

for variant in ("", "qbar", "qint", "barrier", "qint,f32y", "qint,barrier"):
    os.environ["VKRESAMPLE_STAGED_VARIANT"] = variant
    name = variant or "baseline"
    try:
        ms_t = time_device(transform, x, aux=banks, k1=2, k2=8)
        ms_p = time_device(pipe, x, aux=banks, k1=2, k2=8)
        print(f"{name:16s} transform {ms_t:8.3f}  pipeline {ms_p:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:16s} FAILED: {str(e)[:160]}", flush=True)
os.environ.pop("VKRESAMPLE_STAGED_VARIANT", None)
