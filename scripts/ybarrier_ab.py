"""Same-process A/B: optimization_barrier around the int8 digit planes.

bench --stages shows the y stage at ~0.76 ms in-context while the SAME
int8 contraction measures 0.119 ms on materialized inputs — suspicion:
XLA fuses the i16->digit extraction into the matmul operand production
and recomputes it per operand tile.  jax.lax.optimization_barrier forces
the digit planes to materialize once.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
CODEC = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)


def xy_current(xx, bb):
    xr = jnp.moveaxis(xx, -1, -3)
    return dense.r2c_quad(xr, bb, HIGH, **CODEC)


def _int8_y_barrier(Pst, bb):
    pi = Pst.astype(jnp.int32)
    ph = (pi >> 8).astype(jnp.int8)
    pl = ((pi & 255) - 128).astype(jnp.int8)
    pb = (pi.astype(jnp.float32) * jnp.float32(1.0 / 16384.0)).astype(jnp.bfloat16)
    ph, pl, pb = jax.lax.optimization_barrier((ph, pl, pb))

    def mm(a, b):
        return jnp.einsum("jm,...jn->...mn", a, b, preferred_element_type=jnp.int32)

    acc = mm(bb["yq_h"], ph).astype(jnp.float32) * jnp.float32(65536.0)
    acc = acc + (mm(bb["yq_h"], pl) + mm(bb["yq_lo"], ph)).astype(
        jnp.float32
    ) * jnp.float32(256.0)
    acc = acc + mm(bb["yq_lo"], pl).astype(jnp.float32)
    psum = jnp.sum(pi, axis=-2, keepdims=True).astype(jnp.float32)
    acc = acc + jnp.float32(128.0) * psum + bb["yq_comp"][:, None]
    out = acc * bb["yq_scale"]
    return out + jnp.einsum(
        "jm,...jn->...mn", bb["yq_res"], pb, preferred_element_type=jnp.float32
    )


def xy_barrier(xx, bb):
    orig = dense._quad_int8_y
    dense._quad_int8_y = _int8_y_barrier
    try:
        xr = jnp.moveaxis(xx, -1, -3)
        return dense.r2c_quad(xr, bb, HIGH, **CODEC)
    finally:
        dense._quad_int8_y = orig


def xy_no_residual(xx, bb):
    def nores(Pst, bb2):
        pi = Pst.astype(jnp.int32)
        ph = (pi >> 8).astype(jnp.int8)
        pl = ((pi & 255) - 128).astype(jnp.int8)
        ph, pl = jax.lax.optimization_barrier((ph, pl))

        def mm(a, b):
            return jnp.einsum(
                "jm,...jn->...mn", a, b, preferred_element_type=jnp.int32
            )

        acc = mm(bb2["yq_h"], ph).astype(jnp.float32) * jnp.float32(65536.0)
        acc = acc + (mm(bb2["yq_h"], pl) + mm(bb2["yq_lo"], ph)).astype(
            jnp.float32
        ) * jnp.float32(256.0)
        acc = acc + mm(bb2["yq_lo"], pl).astype(jnp.float32)
        psum = jnp.sum(pi, axis=-2, keepdims=True).astype(jnp.float32)
        acc = acc + jnp.float32(128.0) * psum + bb2["yq_comp"][:, None]
        return acc * bb2["yq_scale"]

    orig = dense._quad_int8_y
    dense._quad_int8_y = nores
    try:
        xr = jnp.moveaxis(xx, -1, -3)
        return dense.r2c_quad(xr, bb, HIGH, **CODEC)
    finally:
        dense._quad_int8_y = orig


base = None
for name, fn in [
    ("current", xy_current),
    ("barrier", xy_barrier),
    ("barrier no-residual", xy_no_residual),
]:
    outs = jax.jit(fn)(x, banks)
    if base is None:
        base, md = outs, 0
    else:
        md = max(
            int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
            for a, b in zip(outs, base)
        )
    ms = time_device(fn, x, aux=banks, k1=6, k2=30, reps=2)
    print(f"{name:20s} {ms:7.3f} ms   maxdiff(i16) {md}", flush=True)
