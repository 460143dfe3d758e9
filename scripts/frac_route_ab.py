"""Interleaved same-process A/B for the small fractional r2c route at
the flagship shape (-u 1.5): grid staged form (VKRESAMPLE_FRAC=grid —
9 phase planes + fused grid CAS) vs the default dense big-spectrum mode
(materializes the H x W complex spectrum + full-array CAS).  Pass 1 is
warm-up, pass 2+ decide.  Both routes pinned to the fp64 oracle first.
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
    h=h, w=w, upscale=1.5, precision=Precision.HALF, engine=Engine.MXU
)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

VARIANTS = [("grid ", "grid"), ("dense", "")]

setups = {}
for name, mode in VARIANTS:
    if mode:
        os.environ["VKRESAMPLE_FRAC"] = mode
    else:
        os.environ.pop("VKRESAMPLE_FRAC", None)
    planes_out = up.planes_format(plan) is not None
    banks = up.make_device_banks(plan, Engine.MXU, planes=planes_out)
    fn = jax.jit(
        functools.partial(
            up._pipeline, plan=plan, engine=Engine.MXU,
            planar_out=True, planes_out=planes_out,
        )
    )
    setups[name] = (fn, banks, planes_out, mode)
os.environ.pop("VKRESAMPLE_FRAC", None)

want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
for name, mode in VARIANTS:
    fn, banks, planes_out, _ = setups[name]
    if mode:
        os.environ["VKRESAMPLE_FRAC"] = mode
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
    print(
        f"{name} maxdiff vs oracle: "
        f"{np.abs(got.astype(int) - want.astype(int)).max()}",
        flush=True,
    )
    os.environ.pop("VKRESAMPLE_FRAC", None)

for rnd in (1, 2, 3):
    for name, mode in VARIANTS:
        if mode:
            os.environ["VKRESAMPLE_FRAC"] = mode
        fn, banks, _, _ = setups[name]
        try:
            ms = time_device(fn, x, aux=banks, k1=6, k2=40)
            print(f"pass{rnd} frac {name} {ms:7.3f} ms", flush=True)
        except Exception as e:
            print(f"pass{rnd} frac {name} FAILED: {str(e)[:160]}", flush=True)
        finally:
            os.environ.pop("VKRESAMPLE_FRAC", None)
