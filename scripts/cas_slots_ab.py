"""Interleaved same-process A/B: slot-resident vs aligned-halo
full-array CAS kernel (cas_quantize_pallas — the c2c / fractional /
non-quad woven consumer) at the flagship woven geometry (3, 2048, 4096)
f32, plus the c2c pipeline end-to-end.
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

rng = np.random.default_rng(0)
v = jax.device_put(
    (rng.random((3, 2048, 4096)) * 1.2 - 0.1).astype(np.float32)
)
plan = UpscalePlan(
    h=1024, w=2048, upscale=2.0, precision=Precision.HALF, r2c=False,
    engine=Engine.MXU,
)
banks = make_device_banks(plan, Engine.MXU, planes=False)
img = rng.integers(0, 256, size=(1024, 2048, 3), dtype=np.uint8)
x = jax.device_put(img)
pipe = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=False, planar_out=True
)

base = None
for rnd in (1, 2, 3):
    for name, env in [
        ("halo ", {"VKRESAMPLE_CAS_KERNEL": "halo"}),
        ("slots", {}),
    ]:
        for k, v_ in env.items():
            os.environ[k] = v_
        try:
            if rnd == 1:
                got = np.asarray(
                    jax.jit(functools.partial(cas_quantize_pallas, sharpen=0.2))(v)
                )
                if base is None:
                    base = got
                md = np.abs(got.astype(np.int32) - base.astype(np.int32)).max()
            else:
                md = "-"
            ms = time_device(
                lambda vv, aux: cas_quantize_pallas(vv, 0.2), v, aux=None,
                k1=6, k2=40,
            )
            msp = time_device(pipe, x, aux=banks, k1=4, k2=24)
            print(
                f"pass{rnd} {name} cas {ms:7.3f}  c2c pipeline {msp:7.3f}"
                f" ms  maxdiff {md}", flush=True,
            )
        except Exception as e:
            print(f"pass{rnd} {name} FAILED: {str(e)[:200]}", flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)
