"""Bisect the staged transform's composition gap at 4096x8192: sum of
isolated stages ~21 ms but the full transform measures ~33 ms.  Arms add
one component at a time; the first arm whose delta exceeds its isolated
cost is the fusion/scheduling culprit.
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
banks_nocorr = {k: v for k, v in banks.items() if not k.startswith(("st_", "stbo", "stbe"))}
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
st, ld = cas_ops.to_i16_storage, cas_ops.from_i16_storage


def arm_a(xx, bb):  # x conv -> store
    xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    return st(staged.conv_apply_lanes(xr, bb, "stx_", HI))


def arm_b(xx, bb):  # + y conv of the stored P01
    P01s = arm_a(xx, bb)
    return P01s, st(staged.conv_apply_rows(ld(P01s), bb, "sty_", HI))


def arm_c(xx, bb):  # + P00 branch and its y conv (= transform minus corr)
    xr = jnp.moveaxis(xx, -1, 0)
    return staged.r2c_quad_staged(xr, bb, HI, store=st, load=ld)


def arm_d(xx, bb):  # full transform with corrections
    xr = jnp.moveaxis(xx, -1, 0)
    return staged.r2c_quad_staged(xr, bb, HI, store=st, load=ld)


for name, fn, bb in [
    ("A x->store", arm_a, banks),
    ("B +y(P01)", arm_b, banks),
    ("C +P00+y (no corr)", arm_c, banks_nocorr),
    ("D full transform", arm_d, banks),
]:
    ms = time_device(fn, x, aux=bb, k1=3, k2=12)
    print(f"{name:20s} {ms:9.3f} ms", flush=True)


# --- second-round arms: localize the two-y-conv interference ------------
def arm_e(xx, bb):  # two y convs of two independent pre-stored inputs
    xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    a = st(xr / 255.0)
    b2 = st(xr / 254.0)
    return (
        st(staged.conv_apply_rows(ld(a), bb, "sty_", HI)),
        st(staged.conv_apply_rows(ld(b2), bb, "sty_", HI)),
    )


def arm_g(xx, bb):  # BATCHED double y conv: one call on stacked planes
    xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
    a = st(xr / 255.0)
    b2 = st(xr / 254.0)
    P = jnp.stack([ld(a), ld(b2)])
    out = staged.conv_apply_rows(P, bb, "sty_", HI)
    return st(out[0]), st(out[1])


def arm_h(xx, bb):  # x conv + P00, both stored, NO y convs
    xr = jnp.moveaxis(xx, -1, 0)
    xf = xr.astype(jnp.float32)
    P01s = st(staged.conv_apply_lanes(xf, bb, "stx_", HI))
    signs = jnp.asarray((-1.0) ** np.arange(w), jnp.float32)
    q = jnp.sum(xf * signs, axis=-1, keepdims=True)
    P00s = st(xf / 255.0 - (signs * q) / (255.0 * w))
    return P00s, P01s


for name, fn, bb in [
    ("E 2x y(indep)", arm_e, banks),
    ("G y batched", arm_g, banks),
    ("H xconv+P00", arm_h, banks),
]:
    ms = time_device(fn, x, aux=bb, k1=3, k2=12)
    print(f"{name:20s} {ms:9.3f} ms", flush=True)
