"""Same-process A/B at a >8192 geometry: 4096x8192 -> 8192x16384 2x half.

Routes: the phases-quad planes route (phase decomposition feeding the
quad-parity CAS kernel directly — no woven image, no big spectrum), vs
the XLA-CAS variants of the mixed-radix and jnp.fft tiers.  The >8K tier
is competitive when the in-house route beats XLA on-chip at 1 LSB.
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
from vkresample_tpu.io.png import weave4_host
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, planes_format

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
print("mxu_mode:", plan.mxu_mode, "planes_format:", planes_format(plan), flush=True)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

quad = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
)

# correctness of the quad phases route first
try:
    outs = jax.jit(quad)(x)
    got = weave4_host(*[np.asarray(p) for p in outs])
    want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
    print(
        "phases-quad maxdiff vs oracle:",
        np.abs(got.astype(np.int64) - want.astype(np.int64)).max(),
        flush=True,
    )
    del outs, got, want
except Exception as e:
    print("phases-quad correctness FAILED:", str(e)[:300], flush=True)

for name, eng, no_pallas in [
    ("phases-quad planes", Engine.MXU, False),
    ("phases woven + XLA CAS", Engine.MXU, True),
    ("jnp.fft + XLA CAS", Engine.XLA, True),
]:
    try:
        if no_pallas:
            os.environ["VKRESAMPLE_NO_PALLAS"] = "1"
        fn = functools.partial(
            _pipeline, plan=plan, engine=eng,
            planes_out=not no_pallas, planar_out=True,
        )
        ms = time_device(lambda xx, aux, f=fn: f(xx), x, aux=None, k1=2, k2=6)
        print(f"{name:26s} {ms:9.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
    finally:
        os.environ.pop("VKRESAMPLE_NO_PALLAS", None)
