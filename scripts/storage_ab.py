"""Same-process A/B: pre-CAS storage dtype (f32 vs int16 Q2.14 vs bf16).

The weave+CAS block is HBM-bound; 16-bit storage halves its traffic.  i16
fixed point keeps ~14 bits on the CAS-clipped [0,1] signal (~0.008 u8 LSB),
where bf16 keeps 8 (measured 4 LSB in round 1).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def route(xx, bb, conv):
    xr = jnp.moveaxis(xx, -1, 0)
    U, O = dense.r2c_rows(xr, bb, HIGH)
    v = dense.weave_rows(conv(U), conv(O), 2)
    return cas_quantize_pallas(v, 0.2)


routes = [
    ("f32 storage", functools.partial(route, conv=lambda a: a)),
    ("i16 storage", functools.partial(route, conv=cas_ops.to_i16_storage)),
    ("bf16 storage", functools.partial(route, conv=lambda a: a.astype(jnp.bfloat16))),
]

# on-chip correctness of the i16 route first
got = np.asarray(jax.jit(routes[1][1])(x, banks))
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print("i16 maxdiff vs oracle:", np.abs(got.astype(int) - want.astype(int)).max(), flush=True)

for name, fn in routes:
    ms = time_device(fn, x, aux=banks, k1=4, k2=24)
    print(f"{name:16s} {ms:8.3f} ms", flush=True)
