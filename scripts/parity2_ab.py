"""Same-process A/B: parity CAS with i16 inputs, with and without the
device-side u8 weave (planes go to the PNG encoder's row pointers)."""
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
    cas_parity_planes_u2,
    cas_quantize_pallas,
    cas_quantize_parity_u2,
)
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
import os

os.environ["VKRESAMPLE_YCAS_BANKS"] = "1"  # experiment-only banks
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def _uo(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    U, O = dense.r2c_rows(xr, bb, HIGH)
    return cas_ops.to_i16_storage(U), cas_ops.to_i16_storage(O)


def split_route(xx, bb):
    U, O = _uo(xx, bb)
    return cas_quantize_pallas(dense.weave_rows(U, O, 2), 0.2)


def parity_weave(xx, bb, br):
    U, O = _uo(xx, bb)
    return cas_quantize_parity_u2(U, O, 0.2, block_rows=br)


def parity_planes(xx, bb, br):
    U, O = _uo(xx, bb)
    E, D = cas_parity_planes_u2(U, O, 0.2, block_rows=br)
    return E  # planes are the final device artifact; probe one

routes = [
    ("parity planes bt=64", functools.partial(parity_planes, br=64)),
]

# on-chip correctness of the planes route first
U, O = _uo(x, banks)
E, D = jax.jit(functools.partial(cas_parity_planes_u2, sharpen=0.2, block_rows=64))(U, O)
got = np.stack([np.asarray(E), np.asarray(D)], axis=-2).reshape(3, 2 * h, 2 * w)
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print("parity planes maxdiff vs oracle:", np.abs(got.astype(int) - want.astype(int)).max(), flush=True)

for name, fn in routes:
    try:
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:22s} {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


# fused y+parity-CAS (in-kernel dots, no O in HBM)
from vkresample_tpu.ops.ycas_pallas import ycas_parity_u2


def ycas_parity(xx, bb, wb, bo):
    xr = jnp.moveaxis(xx, -1, 0)
    U, T2 = dense.r2c_x_only(xr, bb, HIGH)
    U = cas_ops.to_i16_storage(U)
    E, D = ycas_parity_u2(U, T2, bb["ycasYT2"], 0.2, Wb=wb, bo=bo)
    return E


# correctness on-chip first
import functools as _ft
E2, D2 = jax.jit(
    _ft.partial(
        lambda xx, bb: (lambda xr: (lambda UT: ycas_parity_u2(
            cas_ops.to_i16_storage(UT[0]), UT[1], bb["ycasYT2"], 0.2, Wb=512, bo=64
        ))(dense.r2c_x_only(xr, bb, HIGH)))(jnp.moveaxis(xx, -1, 0))
    )
)(x, banks)
got2 = np.stack([np.asarray(E2), np.asarray(D2)], axis=-2).reshape(3, 2 * h, 2 * w)
print("ycas_parity maxdiff vs oracle:", np.abs(got2.astype(int) - want.astype(int)).max(), flush=True)

for name, fn in [
    ("ycas_parity Wb=512 bo=64", _ft.partial(ycas_parity, wb=512, bo=64)),
    ("ycas_parity Wb=512 bo=128", _ft.partial(ycas_parity, wb=512, bo=128)),
    ("ycas_parity Wb=256 bo=64", _ft.partial(ycas_parity, wb=256, bo=64)),
]:
    try:
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:26s} {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
