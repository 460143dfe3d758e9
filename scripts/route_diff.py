"""Compare the _pipeline fused route vs the inline sweep variant."""
import functools, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

def inline(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    U, O = dense.r2c_rows(xr, bb, HIGH)
    v = dense.weave_rows(U, O, 2)
    return cas_quantize_pallas(v, 0.2)

route = functools.partial(_pipeline, plan=plan, engine=Engine.MXU, planar_out=True)

for name, fn in [("inline sweep variant", inline), ("pipeline route", route),
                 ("inline again", inline), ("route again", route)]:
    ms = time_device(fn, x, aux=banks, k1=4, k2=24)
    print(f"{name:24s} {ms:8.3f} ms", flush=True)
