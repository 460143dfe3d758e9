"""Same-process A/B at the flagship shape for WOVEN-output callers (the
library upscale() API): rows-parity route (round-2 default, 1.78 ms) vs
quad route + u16-packed column weave (ops/weave.py).

Round-2 record: device-side u8 column interleaves measured 16 ms
(stack+reshape) and 331 ms (strided scatters); the u16 pack does the
interleave as lane arithmetic instead.
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)

for name, env in [("quad16 weave", "quad16"), ("rows route", "rows")]:
    os.environ["VKRESAMPLE_WOVEN"] = env
    fn = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planar_out=True,
        planes_out=False,
    )
    got = np.asarray(jax.jit(fn)(x, banks))
    md = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
    ms = time_device(fn, x, aux=banks, k1=8, k2=40)
    print(f"{name:14s} {ms:7.3f} ms   oracle maxdiff {md}", flush=True)
os.environ.pop("VKRESAMPLE_WOVEN", None)
