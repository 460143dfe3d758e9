"""Same-process A/B for the u>=3 big tier (grid staged route).

Correctness: fp64 oracle at a short u=3 geometry (512x4096 -> 1536x12288
— wide enough to clear DENSE_MAX and ride the grid staged tier with
strips, short enough that the host fp64 oracle builds in ~a minute).
Perf: 2048x4096 -> 6144x12288 3x
half, grid staged (planes + woven) vs what u=3 big frames rode before it
existed: the phases mixed-radix route (woven output + full-array CAS).
"""
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.io.png import weave_grid_host
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import (
    _pipeline, make_device_banks, planes_format,
)

rng = np.random.default_rng(0)


def grid_run(plan, img, planes_out=True):
    banks = make_device_banks(plan, Engine.MXU)
    assert banks is not None and any(
        k.startswith("sgx") for k in banks
    ), f"grid banks missing: {sorted(banks)[:8] if banks else banks}"
    fn = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planes_out=planes_out,
        planar_out=not planes_out,
    )
    return fn, banks


# --- correctness: short u=3 frame vs fp64 oracle ------------------------
h, w, u = 512, 4096, 3
plan = UpscalePlan(
    h=h, w=w, upscale=float(u), precision=Precision.HALF, engine=Engine.AUTO
)
print(
    "small:", plan.mxu_mode, planes_format(plan), f"out {plan.H}x{plan.W}",
    flush=True,
)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
try:
    fn, banks = grid_run(plan, img)
    outs = jax.jit(fn)(x, banks)
    got = weave_grid_host([np.asarray(p) for p in outs], u)
    print(
        "grid staged (small) maxdiff vs oracle:",
        np.abs(got.astype(np.int64) - want.astype(np.int64)).max(),
        flush=True,
    )
except Exception as e:
    print(f"grid small FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
banks = want = outs = got = None

# --- perf: big u=3 frame, no oracle -------------------------------------
h, w = 2048, 4096
plan = UpscalePlan(
    h=h, w=w, upscale=float(u), precision=Precision.HALF, engine=Engine.AUTO
)
print(
    "big:", plan.mxu_mode, planes_format(plan), f"out {plan.H}x{plan.W}",
    flush=True,
)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
try:
    fn, banks = grid_run(plan, img)
    ms = time_device(fn, x, aux=banks, k1=2, k2=8, reps=2)
    print(f"{'grid staged planes':26s} {ms:9.3f} ms", flush=True)
    fnw, _ = grid_run(plan, img, planes_out=False)
    ms = time_device(fnw, x, aux=banks, k1=2, k2=6, reps=2)
    print(f"{'grid staged woven':26s} {ms:9.3f} ms", flush=True)
except Exception as e:
    print(f"grid big FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
banks = None

# --- pre-grid status quo: phases route, woven + XLA CAS ----------------
name = "phases woven + XLA CAS"
try:
    os.environ["VKRESAMPLE_NO_PALLAS"] = "1"
    fn = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planes_out=False,
        planar_out=True,
    )
    ms = time_device(lambda xx, aux, f=fn: f(xx, None), x, aux=None,
                     k1=2, k2=6)
    print(f"{name:26s} {ms:9.3f} ms", flush=True)
except Exception as e:
    print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
finally:
    os.environ.pop("VKRESAMPLE_NO_PALLAS", None)
