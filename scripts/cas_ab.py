"""Same-process A/B: CAS kernel cost within the full pipeline."""
import functools, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

def upto_weave(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    U, O = dense.r2c_rows(xr, bb, HIGH)
    return dense.weave_rows(U, O, 2)

def no_cas(xx, bb):
    return cas_ops.quantize_u8(upto_weave(xx, bb))

def with_cas(xx, bb, br):
    return cas_quantize_pallas(upto_weave(xx, bb), 0.2, block_rows=br)

for name, fn in [
    ("quantize only (no CAS)", no_cas),
    ("dbuf CAS bh=64", functools.partial(with_cas, br=64)),
    ("dbuf CAS bh=128", functools.partial(with_cas, br=128)),
    ("dbuf CAS bh=32", functools.partial(with_cas, br=32)),
    ("quantize only again", no_cas),
]:
    ms = time_device(fn, x, aux=banks, k1=4, k2=24)
    print(f"{name:28s} {ms:8.3f} ms", flush=True)
