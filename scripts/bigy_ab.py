"""Same-process A/B: K-stacked ×256 digit pair in _quad_int8_y.

yh@pl + yl@ph shares the 256 scale, so stacking along the contraction
dim ([yh;yl] @ [pl;ph]) computes the sum in ONE int8 matmul — same
FLOPs, one fewer full-size i32 output (400 MB at the >8K shape) at the
price of one int8 concat.  Tested at the big shape and the flagship.
Also re-checks quad_wsb=2048 end-to-end at the big shape.
"""
import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core import tuning
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import make_device_banks

HIGH = jax.lax.Precision.HIGH
CODEC = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)

_orig = dense._quad_int8_y


def _quad_int8_y_kstack(Pst, banks):
    pi = Pst.astype(jnp.int32)
    ph = (pi >> 8).astype(jnp.int8)
    pl = ((pi & 255) - 128).astype(jnp.int8)

    def mm(a, b):
        return jnp.einsum("jm,...jn->...mn", a, b, preferred_element_type=jnp.int32)

    ycat = jnp.concatenate([banks["yq_h"], banks["yq_lo"]], axis=0)
    pcat = jnp.concatenate([pl, ph], axis=-2)
    acc = mm(banks["yq_h"], ph).astype(jnp.float32) * jnp.float32(65536.0)
    acc = acc + mm(ycat, pcat).astype(jnp.float32) * jnp.float32(256.0)
    acc = acc + mm(banks["yq_lo"], pl).astype(jnp.float32)
    psum = jnp.sum(pi, axis=-2, keepdims=True).astype(jnp.float32)
    acc = acc + jnp.float32(128.0) * psum + banks["yq_comp"][:, None]
    out = acc * banks["yq_scale"]
    pb = (pi.astype(jnp.float32) * jnp.float32(1.0 / 16384.0)).astype(jnp.bfloat16)
    return out + jnp.einsum(
        "jm,...jn->...mn", banks["yq_res"], pb, preferred_element_type=jnp.float32
    )


def run_shape(h, w, k1, k2):
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
    )
    banks = make_device_banks(plan, Engine.MXU)
    img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    x = jax.device_put(img)

    def transform(xx, bb):
        xr = jnp.moveaxis(xx, -1, -3)
        return dense.r2c_quad(xr, bb, HIGH, **CODEC)

    base = jax.jit(transform)(x, banks)
    for name, impl in [("4mm (current)", _orig), ("3mm kstack", _quad_int8_y_kstack)]:
        dense._quad_int8_y = impl
        try:
            outs = jax.jit(functools.partial(transform))(x, banks)
            md = max(
                int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
                for a, b in zip(outs, base)
            )
            ms = time_device(transform, x, aux=banks, k1=k1, k2=k2, reps=2)
            print(f"{h}x{w} {name:14s} {ms:9.3f} ms  maxdiff(i16) {md}", flush=True)
        finally:
            dense._quad_int8_y = _orig


run_shape(1024, 2048, 6, 30)
run_shape(4096, 8192, 2, 8)
