"""Same-process A/B at a >8192 geometry: 4096x8192 -> 8192x16384 2x half.

Tiers: current mixed-radix phases route, XLA jnp.fft route, and the
hybrid (dense y + factored x) as it lands.  The >8K tier is competitive
when the best in-house route beats XLA on-chip at 1 LSB.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline
from vkresample_tpu.oracle import numpy_ref as oracle

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
print("mxu_mode:", plan.mxu_mode, flush=True)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

routes = [
    ("phases (current MXU)", functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planar_out=True)),
    ("xla jnp.fft", functools.partial(
        _pipeline, plan=plan, engine=Engine.XLA, planar_out=True)),
]

for name, fn in routes:
    try:
        ms = time_device(lambda xx, aux, f=fn: f(xx), x, aux=None, k1=2, k2=6)
        print(f"{name:24s} {ms:9.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
