"""Round-3 stage split at BOTH big geometries with the committed
defaults (sqrt splits, qint, HIGH staged precision, CAS bt=64):
transform vs pipeline isolates the CAS share at 8K->16K and 16K->32K."""
import functools
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

codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
for h, w, c in [(4096, 8192, 3), (8192, 16384, 1)]:
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF,
        engine=Engine.AUTO, channels=c,
    )
    banks = make_device_banks(plan, Engine.MXU)
    img = np.random.default_rng(0).integers(0, 256, (h, w, c), np.uint8)
    x = jax.device_put(img)

    def transform(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0)
        return staged.r2c_quad_staged(xr, bb, staged.staged_precision(), **codec)

    pipe = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
    )
    ms_t = time_device(transform, x, aux=banks, k1=2, k2=8)
    ms_p = time_device(pipe, x, aux=banks, k1=2, k2=8)
    print(
        f"{h}x{w}({c}ch): transform {ms_t:8.3f}  pipeline {ms_p:8.3f}  "
        f"cas-share {ms_p - ms_t:8.3f} ms", flush=True,
    )
