"""Timing-only 16K->32K staged run (correctness was oracle-pinned at
82.3 ms/maxdiff 1 earlier; the fp64 oracle at 8192x16384 takes >10 min
of host numpy, so perf re-runs skip it)."""
import functools
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 8192, 16384
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO,
    channels=1,
)
banks = make_device_banks(plan, Engine.MXU)
assert banks is not None and "stx_b1" in banks
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 1), dtype=np.uint8)
x = jax.device_put(img)
pipe = functools.partial(_pipeline, plan=plan, engine=Engine.MXU, planes_out=True)
ms = time_device(pipe, x, aux=banks, k1=2, k2=6, reps=2)
print(f"16K->32K staged planes (1ch) {ms:9.3f} ms", flush=True)
