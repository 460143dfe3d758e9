"""Same-process A/B: full-width slot-resident quad CAS vs the classic
band kernel at the FLAGSHIP geometry (planes (3, 1024, 2048) i16 —
2048x1024 -> 4096x2048 half).

The full-width _quad_kernel DMAs and computes (bt + 2*pad) rows per
bt-row band — 1.5x at the tuned bt=64/pad=16.  The slots variant DMAs
exactly bt rows and reads the 1-row halos from neighbor bands' slots
(amplification (bt+2)/bt = 1.03), and frees bt from the pad grid.
Also times the flagship pipeline end-to-end under both kernels.
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
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

rng = np.random.default_rng(0)
c, h, wh = 3, 1024, 2048
planes = tuple(
    jax.device_put(rng.integers(-18000, 18000, (c, h, wh)).astype(np.int16))
    for _ in range(4)
)
plan = UpscalePlan(
    h=1024, w=2048, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
banks = make_device_banks(plan, Engine.MXU)
img = rng.integers(0, 256, size=(1024, 2048, 3), dtype=np.uint8)
x = jax.device_put(img)
pipe = functools.partial(_pipeline, plan=plan, engine=Engine.MXU, planes_out=True)

base = None
for name, env in [
    ("halo  bt64 (old default)", {"VKRESAMPLE_QUAD_STRIP": "halo"}),
    ("slots default (bt=32)", {}),
    ("slots bt16", {"VKRESAMPLE_QUAD_BLOCK": "16"}),
    ("slots bt48", {"VKRESAMPLE_QUAD_BLOCK": "48"}),
    ("slots bt64", {"VKRESAMPLE_QUAD_BLOCK": "64"}),
]:
    def run(xx, aux):
        return cas_parity4_planes_u2(xx, *aux, 0.2)

    for k, v in env.items():
        os.environ[k] = v
    try:
        br = int(env.get("VKRESAMPLE_QUAD_BLOCK", "0")) or None
        got = [
            np.asarray(p)
            for p in jax.jit(
                functools.partial(
                    cas_parity4_planes_u2, sharpen=0.2, block_rows=br
                )
            )(*planes)
        ]
        if base is None:
            base = got
        md = max(
            np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
            for a, b in zip(got, base)
        )
        ms = time_device(
            lambda xx, aux, br=br: cas_parity4_planes_u2(
                xx, *aux, 0.2, block_rows=br
            ),
            planes[0], aux=planes[1:], k1=6, k2=40,
        )
        msp = time_device(pipe, x, aux=banks, k1=6, k2=40)
        print(
            f"{name:26s} cas {ms:7.3f}  pipeline {msp:7.3f} ms"
            f"  maxdiff-vs-halo {md}", flush=True,
        )
    except Exception as e:
        print(f"{name:26s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
