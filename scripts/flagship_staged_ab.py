"""Same-process A/B at the FLAGSHIP shape (1024x2048 -> 2048x4096 half):
dense int8 quad route (current <=8192 default, stage split x 0.52 /
y 0.26 / CAS 0.54) vs the staged circulant route, plus isolated x/y
stage comparisons.  Decides whether the staged tier's threshold drops
below DENSE_MAX.
"""
import functools
import sys

import jax
import numpy as np
from jax import numpy as jnp

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
dbanks = make_device_banks(plan, Engine.MXU)  # dense rows/quad set
sbanks = jax.device_put(
    {k: jnp.asarray(v) for k, v in staged.r2c_quad_staged_banks(plan).items()}
)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)


def weave(outs):
    got = np.zeros((3, 2 * h, 2 * w), np.uint8)
    got[:, 0::2, 0::2] = np.asarray(outs[0])
    got[:, 0::2, 1::2] = np.asarray(outs[1])
    got[:, 1::2, 0::2] = np.asarray(outs[2])
    got[:, 1::2, 1::2] = np.asarray(outs[3])
    return got


pipe = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
)
# staged correctness at the flagship shape first
outs = jax.jit(pipe)(x, sbanks)
md = int(np.abs(weave(outs).astype(int) - want.astype(int)).max())
print(f"staged flagship maxdiff vs oracle: {md}", flush=True)

for name, bb in [("dense-int8", dbanks), ("staged", sbanks)]:
    ms = time_device(pipe, x, aux=bb, k1=8, k2=40)
    print(f"{name:12s} pipeline {ms:8.3f} ms", flush=True)


# isolated stages
def x_dense(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    return dense.r2c_quad(xr, bb, HIGH, **codec)[:2]


def x_staged(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    return cas_ops.to_i16_storage(
        staged.conv_apply_lanes(xr, bb, "stx_", jax.lax.Precision.HIGHEST)
    )


def y_dense(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    return dense.r2c_quad(xr, bb, HIGH, **codec)[2:]


def y_staged(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    P00s = cas_ops.to_i16_storage(xr.astype(jnp.float32) / 255.0)
    return cas_ops.to_i16_storage(
        staged.conv_apply_rows(
            cas_ops.from_i16_storage(P00s), bb, "sty_",
            jax.lax.Precision.HIGHEST,
        )
    )


for name, fn, bb in [
    ("x dense(both)", x_dense, dbanks), ("x staged", x_staged, sbanks),
    ("y dense(both)", y_dense, dbanks), ("y staged(one)", y_staged, sbanks),
]:
    ms = time_device(fn, x, aux=bb, k1=8, k2=40)
    print(f"{name:14s} {ms:8.3f} ms", flush=True)
