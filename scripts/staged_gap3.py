"""Third-round bisect of the staged composition gap at 4096x8192.

Round 2 established (same-process): two y convs alone 15.2 ms (no
mutual interference), x conv + P00 7.5, x conv + one y conv 13.7 — but
x conv + P00 + BOTH y convs = 32.4 (expected ~22).  These arms separate
"x conv + two y convs" from "P00's producer chain feeds a y conv".
"""
import functools
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

HI = jax.lax.Precision.HIGHEST
h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
banks = jax.device_put(
    {k: jnp.asarray(v) for k, v in staged.r2c_quad_staged_banks(plan).items()}
)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
st, ld = cas_ops.to_i16_storage, cas_ops.from_i16_storage


def _p00(xf):
    signs = jnp.asarray((-1.0) ** np.arange(w), jnp.float32)
    q = jnp.sum(xf * signs, axis=-1, keepdims=True)
    return xf / 255.0 - (signs * q) / (255.0 * w)


def arm_i(xx, bb):  # x conv + P00 + ONLY P00's y conv
    xf = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    P01s = st(staged.conv_apply_lanes(xf, bb, "stx_", HI))
    P00s = st(_p00(xf))
    return P01s, P00s, st(staged.conv_apply_rows(ld(P00s), bb, "sty_", HI))


def arm_j(xx, bb):  # x conv + y(P01) + y(independent) — NO P00 chain
    xf = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    P01s = st(staged.conv_apply_lanes(xf, bb, "stx_", HI))
    ind = st(xf / 254.0)
    return (
        P01s,
        st(staged.conv_apply_rows(ld(P01s), bb, "sty_", HI)),
        st(staged.conv_apply_rows(ld(ind), bb, "sty_", HI)),
    )


def arm_k(xx, bb):  # P00 + both y convs — NO x conv
    xf = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    P00s = st(_p00(xf))
    ind = st(xf / 254.0)
    return (
        P00s,
        st(staged.conv_apply_rows(ld(P00s), bb, "sty_", HI)),
        st(staged.conv_apply_rows(ld(ind), bb, "sty_", HI)),
    )


def arm_l(xx, bb):  # full shape but x conv REPLACED by cheap elementwise
    xf = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    P01s = st(xf / 253.0)
    P00s = st(_p00(xf))
    return (
        P00s, P01s,
        st(staged.conv_apply_rows(ld(P00s), bb, "sty_", HI)),
        st(staged.conv_apply_rows(ld(P01s), bb, "sty_", HI)),
    )


for name, fn in [
    ("I xc+P00+y(P00)", arm_i),
    ("J xc+y(P01)+y(ind)", arm_j),
    ("K P00+2y (no xc)", arm_k),
    ("L 2y full, no xc", arm_l),
]:
    ms = time_device(fn, x, aux=banks, k1=3, k2=12)
    print(f"{name:22s} {ms:9.3f} ms", flush=True)
