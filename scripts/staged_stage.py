"""Same-process stage split + precision A/B for the staged circulant
route at the big geometry (4096x8192 -> 8192x16384, 2x half).

Isolates: x conv, P00, corrections, y conv, full transform, full
pipeline — each at HIGHEST (true-f32 grade) and HIGH (bf16x3).  The
accuracy gate for HIGH is the on-chip oracle check in staged_ab.py run
with VKRESAMPLE_STAGED_PRECISION=high.
"""
import functools
import os
import sys

import jax
import numpy as np
from jax import numpy as jnp

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
banks = make_device_banks(plan, Engine.MXU)
assert banks is not None and "stx_b1" in banks
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)

HP = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH}

for pname, prec in HP.items():

    def xconv(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
        return cas_ops.to_i16_storage(
            staged.conv_apply_lanes(xr, bb, "stx_", prec)
        )

    def p00(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0)
        xf = xr.astype(jnp.float32)
        signs = jnp.asarray((-1.0) ** np.arange(w), jnp.float32)
        q = jnp.sum(xf * signs, axis=-1, keepdims=True)
        return cas_ops.to_i16_storage(
            xf / 255.0 - (signs * q) / (255.0 * w)
        )

    def yconv(xx, bb):
        # y conv isolated: feed it the stored P00 (built cheaply)
        xr = jnp.moveaxis(xx, -1, 0)
        P00s = cas_ops.to_i16_storage(xr.astype(jnp.float32) / 255.0)
        return cas_ops.to_i16_storage(
            staged.conv_apply_rows(
                cas_ops.from_i16_storage(P00s), bb, "sty_", prec
            )
        )

    def corr(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
        tcorr = jnp.einsum("...hw,hr->...rw", xr, bb["st_y1n"], precision=prec)
        return (
            staged.conv_apply_lanes(tcorr, bb, "stbo_", prec),
            staged.conv_apply_lanes(tcorr, bb, "stbe_", prec),
        )

    def transform(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0)
        return staged.r2c_quad_staged(xr, bb, prec, **codec)

    for name, fn in [
        ("x conv", xconv), ("P00", p00), ("y conv", yconv),
        ("corrections", corr), ("transform", transform),
    ]:
        try:
            ms = time_device(fn, x, aux=banks, k1=2, k2=8)
            print(f"[{pname:7s}] {name:12s} {ms:9.3f} ms", flush=True)
        except Exception as e:
            print(f"[{pname:7s}] {name:12s} FAILED: {str(e)[:160]}", flush=True)

# full pipeline at both precisions (env knob, trace-time)
for pname in ("highest", "high"):
    os.environ["VKRESAMPLE_STAGED_PRECISION"] = pname
    pipe = functools.partial(
        _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
    )
    ms = time_device(pipe, x, aux=banks, k1=2, k2=8, reps=2)
    print(f"[{pname:7s}] {'pipeline':12s} {ms:9.3f} ms", flush=True)
os.environ.pop("VKRESAMPLE_STAGED_PRECISION", None)
