"""Same-process A/B: quad-parity (half-width x matmul, 4 planes) vs
row-parity planes (full x matmul, 2 planes)."""
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
from vkresample_tpu.ops.cas_pallas import (
    cas_parity4_planes_u2,
    cas_parity_planes_u2,
)
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


def rows_route(xx, bb, br=64):
    xr = jnp.moveaxis(xx, -1, 0)
    U, O = dense.r2c_rows(xr, bb, HIGH)
    E, D = cas_parity_planes_u2(
        cas_ops.to_i16_storage(U), cas_ops.to_i16_storage(O), 0.2, block_rows=br
    )
    return E


def quad_route(xx, bb, br):
    xr = jnp.moveaxis(xx, -1, 0)
    Ps = dense.r2c_quad(xr, bb, HIGH)
    Ps = [cas_ops.to_i16_storage(p) for p in Ps]
    outs = cas_parity4_planes_u2(*Ps, 0.2, block_rows=br)
    return outs[0]


def quad_full(xx, bb, br):
    xr = jnp.moveaxis(xx, -1, 0)
    Ps = dense.r2c_quad(xr, bb, HIGH)
    Ps = [cas_ops.to_i16_storage(p) for p in Ps]
    return cas_parity4_planes_u2(*Ps, 0.2, block_rows=br)


# on-chip correctness first
outs = jax.jit(functools.partial(quad_full, br=32))(x, banks)
got = np.zeros((3, 2 * h, 2 * w), np.uint8)
got[:, 0::2, 0::2] = np.asarray(outs[0])
got[:, 0::2, 1::2] = np.asarray(outs[1])
got[:, 1::2, 0::2] = np.asarray(outs[2])
got[:, 1::2, 1::2] = np.asarray(outs[3])
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print("quad maxdiff vs oracle:", np.abs(got.astype(int) - want.astype(int)).max(), flush=True)

for name, fn in [
    ("rows planes bt=64", rows_route),
    ("quad planes bt=32", functools.partial(quad_route, br=32)),
    ("quad planes bt=64", functools.partial(quad_route, br=64)),
]:
    try:
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:22s} {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
