"""Interleaved same-process A/B: slot-resident vs aligned-halo rows
kernel (the woven library-API route) at the flagship geometry —
isolated CAS stage (U/O (3,1024,2048) f32, u=2) and the woven pipeline.
Two passes: pass 1 carries device warm-up, pass 2+ decides.
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
from vkresample_tpu.ops.cas_pallas import cas_quantize_rows_u
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

rng = np.random.default_rng(0)
c, h, wv = 3, 1024, 2048
U = jax.device_put((rng.random((c, h, wv)) * 1.2 - 0.1).astype(np.float32))
O = jax.device_put((rng.random((c, h, wv)) * 1.2 - 0.1).astype(np.float32))

plan = UpscalePlan(
    h=1024, w=2048, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
os.environ["VKRESAMPLE_WOVEN"] = "rows"
banks = make_device_banks(plan, Engine.MXU, planes=False)
img = rng.integers(0, 256, size=(1024, 2048, 3), dtype=np.uint8)
x = jax.device_put(img)
pipe = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=False, planar_out=True
)

base = None
for rnd in (1, 2, 3):
    for name, env in [
        ("halo ", {"VKRESAMPLE_ROWS_KERNEL": "halo"}),
        ("slots", {}),
    ]:
        for k, v in env.items():
            os.environ[k] = v
        try:
            if rnd == 1:
                got = np.asarray(
                    jax.jit(
                        functools.partial(cas_quantize_rows_u, u=2, sharpen=0.2)
                    )(U, O)
                )
                if base is None:
                    base = got
                md = np.abs(
                    got.astype(np.int32) - base.astype(np.int32)
                ).max()
            else:
                md = "-"
            ms = time_device(
                lambda uu, aux: cas_quantize_rows_u(uu, aux, 2, 0.2),
                U, aux=O, k1=6, k2=40,
            )
            msp = time_device(pipe, x, aux=banks, k1=6, k2=40)
            print(
                f"pass{rnd} {name} cas {ms:7.3f}  woven pipeline {msp:7.3f}"
                f" ms  maxdiff {md}", flush=True,
            )
        except Exception as e:
            print(f"pass{rnd} {name} FAILED: {str(e)[:200]}", flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)
