"""Interleaved PIPELINE-level A/B: 3-digit y bank (yq3, no bf16 residual
pass) vs the round-2 2-digit+residual form, at the flagship shape.

Isolated-op timing of the y pass sits at the measurement noise floor on
this host (scripts/y3_ab.py), so the decision runs at the 1.3 ms
pipeline scale where the profiled 0.157 ms residual cost is ~11%.
Fresh closures + separately built bank dicts per variant (the env knob
is resolved at BANK BUILD time; route dispatch is bank-content-based).
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import mxu_pipeline
from vkresample_tpu.io.png import weave4_host
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline

h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, sharpen=0.2,
    engine=Engine.MXU,
)
rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)

variants = []
for name, yd in [("y3 (new)", "3"), ("y2+res   ", "2")]:
    os.environ["VKRESAMPLE_Y_DIGITS"] = yd
    banks = jax.device_put(mxu_pipeline.make_dense_banks(plan, "float32"))
    fn = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planar_out=True,
        planes_out=True,
    )
    outs = jax.block_until_ready(jax.jit(fn)(x, banks))
    got = weave4_host(*[np.asarray(p)[None] for p in outs])[0]
    md = int(np.abs(got.astype(int) - want.astype(int)).max())
    print(f"{name} oracle maxdiff: {md}", flush=True)
    variants.append((name, fn, banks))
os.environ.pop("VKRESAMPLE_Y_DIGITS", None)

for rnd in (1, 2, 3):
    for name, fn, banks in variants:
        ms = time_device(fn, x, aux=banks, k1=6, k2=40)
        print(f"pass{rnd} {name} pipeline {ms:7.3f} ms", flush=True)
