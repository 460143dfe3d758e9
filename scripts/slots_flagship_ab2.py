"""Interleaved same-process A/B for the flagship full-width quad CAS:
halo-bt64 vs slots-bt32 vs slots-bt64, measured in TWO alternating
passes.  Two sequential A/B runs showed strong positional drift (the
last variant in a process always measured fastest — device warm-up),
so single-pass orderings are not decision-grade; the second pass's
ordering-independent deltas are.
"""
import functools
import os
import sys

import jax
import numpy as np

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

VARIANTS = [
    ("halo  bt64", {"VKRESAMPLE_QUAD_STRIP": "halo"}, 64),
    ("slots bt32", {"VKRESAMPLE_QUAD_FW_BT": "32"}, 32),
    ("slots bt64", {"VKRESAMPLE_QUAD_FW_BT": "64"}, 64),
]

for rnd in (1, 2, 3):
    for name, env, br in VARIANTS:
        for k, v in env.items():
            os.environ[k] = v
        try:
            ms = time_device(
                lambda xx, aux, br=br: cas_parity4_planes_u2(
                    xx, *aux, 0.2, block_rows=br
                ),
                planes[0], aux=planes[1:], k1=6, k2=40,
            )
            msp = time_device(pipe, x, aux=banks, k1=6, k2=40)
            print(
                f"pass{rnd} {name:12s} cas {ms:7.3f}  pipeline {msp:7.3f} ms",
                flush=True,
            )
        except Exception as e:
            print(f"pass{rnd} {name:12s} FAILED: {str(e)[:160]}", flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)
