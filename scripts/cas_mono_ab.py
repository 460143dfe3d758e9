"""A/B: manual-DMA grid kernel vs mono-kernel CAS."""
import functools, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas, cas_quantize_mono
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.oracle import numpy_ref as oracle

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

def upto_weave(xx, bb):
    U, O = dense.r2c_rows(jnp.moveaxis(xx, -1, 0), bb, HIGH)
    return dense.weave_rows(U, O, 2)

def v_grid(xx, bb):
    return cas_quantize_pallas(upto_weave(xx, bb), 0.2)

def v_mono128(xx, bb):
    return cas_quantize_mono(upto_weave(xx, bb), 0.2, block_rows=128)

def v_mono64(xx, bb):
    return cas_quantize_mono(upto_weave(xx, bb), 0.2, block_rows=64)

got = np.asarray(jax.jit(v_mono128)(x, banks))
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print("mono TPU maxdiff:", np.abs(got.astype(int)-want.astype(int)).max(), flush=True)

for name, fn in [("grid kernel", v_grid), ("mono bh=128", v_mono128),
                 ("mono bh=64", v_mono64), ("grid again", v_grid),
                 ("mono-128 again", v_mono128)]:
    try:
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:20s} {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:20s} FAIL {str(e)[:100]}", flush=True)
