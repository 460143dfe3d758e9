"""Same-process sweep: quad CAS band height + end-to-end flagship route."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def quad_route(xx, bb, br):
    xr = jnp.moveaxis(xx, -1, 0)
    Ps = dense.r2c_quad(xr, bb, HIGH)
    Ps = [cas_ops.to_i16_storage(p) for p in Ps]
    return cas_parity4_planes_u2(*Ps, 0.2, block_rows=br)[0]


for br in (64, 96, 128, 256):
    try:
        ms = time_device(
            functools.partial(quad_route, br=br), x, aux=banks, k1=4, k2=24
        )
        print(f"quad bt={br:<4d} {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"quad bt={br:<4d} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
