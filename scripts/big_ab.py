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

want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)

# --- dense int8 big-quad route (banks present) -------------------------
from vkresample_tpu.pipeline.upscale import make_device_banks  # noqa: E402

try:
    banks = make_device_banks(plan, Engine.MXU)
    assert banks is not None and "xq_d1" in banks, "big int8 banks missing"
    dense_quad = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
    )
    outs = jax.jit(dense_quad)(x, banks)
    got = weave4_host(*[np.asarray(p) for p in outs])
    print(
        "dense-int8 quad maxdiff vs oracle:",
        np.abs(got.astype(np.int64) - want.astype(np.int64)).max(),
        flush=True,
    )
    del outs, got
    ms = time_device(dense_quad, x, aux=banks, k1=2, k2=8, reps=2)
    print(f"{'dense-int8 quad planes':26s} {ms:9.3f} ms", flush=True)
except Exception as e:
    print(f"dense-int8 quad FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
banks = None

# --- phases route (banks=None) and XLA baselines -----------------------
quad = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
)

try:
    outs = jax.jit(quad)(x, None)
    got = weave4_host(*[np.asarray(p) for p in outs])
    print(
        "phases-quad maxdiff vs oracle:",
        np.abs(got.astype(np.int64) - want.astype(np.int64)).max(),
        flush=True,
    )
    del outs, got
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
