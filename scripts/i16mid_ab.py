"""Same-process A/B: i16 inter-stage spectral intermediates
(VKRESAMPLE_STAGED_INTERMEDIATE=i16, static L1-norm bounds from the
banks' qb entries) vs the default f32 intermediates, at the 8K->16K
staged geometry.  The convs are ~60-70% HBM-bound; i16 halves the
inter-stage bytes.  Gates: measurable transform win AND e2e maxdiff <= 1
vs the fp64 oracle (accuracy scales with n2 — CPU measured 0.33-0.55 u8
LSB at small sizes, so the big-size oracle check is the decider).
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

codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
h, w, c = 4096, 8192, 3
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


pipe = functools.partial(_pipeline, plan=plan, engine=Engine.MXU, planes_out=True)

base_planes = None
for name, env in [("f32 mid (default)", {}),
                  ("i16 mid", {"VKRESAMPLE_STAGED_INTERMEDIATE": "i16"})]:
    for k, v in env.items():
        os.environ[k] = v
    try:
        got = [np.asarray(p, np.int32) for p in jax.jit(transform)(x, banks)]
        if base_planes is None:
            base_planes = got
        md = max(np.abs(a - b).max() for a, b in zip(got, base_planes))
        del got
        ms_t = time_device(transform, x, aux=banks, k1=2, k2=8)
        ms_p = time_device(pipe, x, aux=banks, k1=2, k2=8)
        print(
            f"{name:20s} transform {ms_t:8.3f}  pipeline {ms_p:8.3f} ms"
            f"  maxdev-vs-f32(Q2.14) {md}", flush=True,
        )
    except Exception as e:
        print(f"{name:20s} FAILED: {str(e)[:250]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
