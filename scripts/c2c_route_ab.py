"""Interleaved same-process A/B for the c2c route at the flagship shape:
staged GRID (parity planes + fused quad CAS + i16 codec) vs the dense
5-matmul complex chain (+ full-array CAS).  Three alternating passes —
pass 1 is warm-up, pass 2+ decide (device warm-up drift makes single-pass
orderings lie).  Also pins both routes' pixels to the fp64 oracle.

The route is trace-time (VKRESAMPLE_C2C), so each variant builds its own
banks and jits a fresh closure (the jit cpp cache ignores env changes on
the same function object).
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
from vkresample_tpu.pipeline import upscale as up

rng = np.random.default_rng(0)
h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, r2c=False, precision=Precision.HALF,
    engine=Engine.MXU,
)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

VARIANTS = [("grid ", "staged"), ("dense", "dense")]

# build per-variant banks + pipelines up front (trace-time routing)
setups = {}
for name, mode in VARIANTS:
    os.environ["VKRESAMPLE_C2C"] = mode
    planes_out = up.planes_format(plan) is not None
    banks = up.make_device_banks(plan, Engine.MXU, planes=planes_out)
    fn = jax.jit(
        functools.partial(
            up._pipeline, plan=plan, engine=Engine.MXU,
            planar_out=True, planes_out=planes_out,
        )
    )
    setups[name] = (fn, banks, planes_out)
os.environ.pop("VKRESAMPLE_C2C", None)

# correctness first: both routes vs the fp64 oracle
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
for name, mode in VARIANTS:
    os.environ["VKRESAMPLE_C2C"] = mode
    fn, banks, planes_out = setups[name]
    out = fn(x, banks)
    if planes_out:
        ps = [np.asarray(p) for p in out]
        u = int(round(len(ps) ** 0.5))
        got = np.zeros_like(want)
        i = 0
        for ry in range(u):
            for rx in range(u):
                got[:, ry::u, rx::u] = ps[i]
                i += 1
    else:
        got = np.asarray(out)
    diff = np.abs(got.astype(int) - want.astype(int)).max()
    print(f"{name} maxdiff vs oracle: {diff}", flush=True)
os.environ.pop("VKRESAMPLE_C2C", None)

for rnd in (1, 2, 3):
    for name, mode in VARIANTS:
        os.environ["VKRESAMPLE_C2C"] = mode
        fn, banks, _ = setups[name]
        try:
            ms = time_device(fn, x, aux=banks, k1=6, k2=40)
            print(f"pass{rnd} c2c {name} {ms:7.3f} ms", flush=True)
        except Exception as e:
            print(f"pass{rnd} c2c {name} FAILED: {str(e)[:160]}", flush=True)
        finally:
            os.environ.pop("VKRESAMPLE_C2C", None)
