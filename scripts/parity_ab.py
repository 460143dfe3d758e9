"""Same-process A/B: weave+plain CAS vs per-parity fused CAS (u=2)."""
import functools, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas, cas_quantize_parity_u2
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.oracle import numpy_ref as oracle

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

def rows(xx, bb):
    return dense.r2c_rows(jnp.moveaxis(xx, -1, 0), bb, HIGH)

def weave_plain(xx, bb):
    U, O = rows(xx, bb)
    return cas_quantize_pallas(dense.weave_rows(U, O, 2), 0.2)

def parity(xx, bb):
    U, O = rows(xx, bb)
    return cas_quantize_parity_u2(U, O, 0.2)

# correctness on TPU first
got = np.asarray(jax.jit(parity)(x, banks))
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print("parity TPU maxdiff:", np.abs(got.astype(int)-want.astype(int)).max(), flush=True)

for name, fn in [("weave+plain (bh=128)", weave_plain), ("parity fused", parity),
                 ("weave+plain again", weave_plain), ("parity again", parity)]:
    ms = time_device(fn, x, aux=banks, k1=4, k2=24)
    print(f"{name:24s} {ms:8.3f} ms", flush=True)
