"""HIGH (bf16x3) staged-precision gate at 8K->16K, post-composition-fix.

With the program additive again, the matmul passes are a larger cost
fraction, so HIGH is worth re-testing.  One fp64 oracle evaluation
gates BOTH precisions (accuracy: maxdiff <= 1), then same-process
timings decide.
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.io.png import weave4_host
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
banks = make_device_banks(plan, Engine.MXU)
assert banks is not None and "stx_b1" in banks
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
pipe = functools.partial(_pipeline, plan=plan, engine=Engine.MXU, planes_out=True)

want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
for pname in ("highest", "high"):
    os.environ["VKRESAMPLE_STAGED_PRECISION"] = pname
    outs = jax.jit(pipe)(x, banks)
    got = weave4_host(*[np.asarray(p) for p in outs])
    del outs
    md = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
    del got
    ms = time_device(pipe, x, aux=banks, k1=2, k2=8, reps=2)
    print(f"[{pname:7s}] pipeline {ms:8.3f} ms  oracle maxdiff {md}", flush=True)
os.environ.pop("VKRESAMPLE_STAGED_PRECISION", None)
os.environ.pop("VKRESAMPLE_STAGED_INTERMEDIATE", None)
