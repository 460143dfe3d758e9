"""Same-process A/B round 2: kill the double-materialization in the quad
transform stage.

P00/P01 feed TWO consumers (the i16 Q2.14 store for CAS and the y
matmul), so XLA materializes the f32 planes (50 MB) besides the i16 ones.
Variant `i16feed` quantizes FIRST and feeds the y matmul from the
dequantized i16 planes: the f32 planes never exist, and the added
quantization error (2^-15 * sum|Y| ~ 1e-4 -> 0.02 u8 LSB) is far under
the bf16 operand rounding the HIGH matmul already has.
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


def quad_current(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    Ps = dense.r2c_quad(xr, bb, HIGH)
    return tuple(cas_ops.to_i16_storage(p) for p in Ps)


def _head(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    bank_dt = bb["alpha_odd_hi"].dtype
    xb = xr.astype(bank_dt)
    acc = jnp.float32
    a_cat = jnp.concatenate([bb["alpha_odd_hi"], bb["alpha_odd_lo"]], axis=0)
    x_cat = jnp.concatenate([xb, xb], axis=-1)
    P01 = jnp.einsum("...hk,kn->...hn", x_cat, a_cat, preferred_element_type=acc)
    xf = xr.astype(acc)
    signs = jnp.asarray((-1.0) ** np.arange(w), acc)
    q = jnp.sum(xf * signs, axis=-1, keepdims=True)
    P00 = xf * (1.0 / 255.0) - (signs * q) * (1.0 / (255.0 * w))
    t2e = t2o = None
    if "Y1n" in bb:
        tcorr = jnp.einsum("...hw,hr->...rw", xf, bb["Y1n"], precision=HIGH)
        t2 = jnp.einsum("...rw,wn->...rn", tcorr, bb["beta"], precision=HIGH)
        t2e, t2o = t2[..., 0::2], t2[..., 1::2]
    return P00, P01, t2e, t2o


def quad_i16feed(xx, bb):
    P00, P01, t2e, t2o = _head(xx, bb)
    P00s = cas_ops.to_i16_storage(P00)
    P01s = cas_ops.to_i16_storage(P01)
    P00d = cas_ops.from_i16_storage(P00s)
    P01d = cas_ops.from_i16_storage(P01s)
    Y = bb["Ymat_ns"]
    Ym, Yc = Y[:h], Y[h:]
    P10 = jnp.einsum("jm,cjn->cmn", Ym, P00d, precision=HIGH)
    P11 = jnp.einsum("jm,cjn->cmn", Ym, P01d, precision=HIGH)
    if t2e is not None:
        P10 = P10 + jnp.einsum("rm,crn->cmn", Yc, t2e, precision=HIGH)
        P11 = P11 + jnp.einsum("rm,crn->cmn", Yc, t2o, precision=HIGH)
    return P00s, P01s, cas_ops.to_i16_storage(P10), cas_ops.to_i16_storage(P11)


def quad_i16feed_x2(xx, bb):
    """i16feed + x matmul as two einsums (no x_cat copy), added."""
    xr = jnp.moveaxis(xx, -1, 0)
    bank_dt = bb["alpha_odd_hi"].dtype
    xb = xr.astype(bank_dt)
    acc = jnp.float32
    Phi = jnp.einsum(
        "...hk,kn->...hn", xb, bb["alpha_odd_hi"], preferred_element_type=acc
    )
    Plo = jnp.einsum(
        "...hk,kn->...hn", xb, bb["alpha_odd_lo"], preferred_element_type=acc
    )
    P01 = Phi + Plo
    xf = xr.astype(acc)
    signs = jnp.asarray((-1.0) ** np.arange(w), acc)
    q = jnp.sum(xf * signs, axis=-1, keepdims=True)
    P00 = xf * (1.0 / 255.0) - (signs * q) * (1.0 / (255.0 * w))
    t2e = t2o = None
    if "Y1n" in bb:
        tcorr = jnp.einsum("...hw,hr->...rw", xf, bb["Y1n"], precision=HIGH)
        t2 = jnp.einsum("...rw,wn->...rn", tcorr, bb["beta"], precision=HIGH)
        t2e, t2o = t2[..., 0::2], t2[..., 1::2]
    P00s = cas_ops.to_i16_storage(P00)
    P01s = cas_ops.to_i16_storage(P01)
    P00d = cas_ops.from_i16_storage(P00s)
    P01d = cas_ops.from_i16_storage(P01s)
    Y = bb["Ymat_ns"]
    Ym, Yc = Y[:h], Y[h:]
    P10 = jnp.einsum("jm,cjn->cmn", Ym, P00d, precision=HIGH)
    P11 = jnp.einsum("jm,cjn->cmn", Ym, P01d, precision=HIGH)
    if t2e is not None:
        P10 = P10 + jnp.einsum("rm,crn->cmn", Yc, t2e, precision=HIGH)
        P11 = P11 + jnp.einsum("rm,crn->cmn", Yc, t2o, precision=HIGH)
    return P00s, P01s, cas_ops.to_i16_storage(P10), cas_ops.to_i16_storage(P11)


VARIANTS = [
    ("current (f32 planes)", quad_current),
    ("i16feed", quad_i16feed),
    ("i16feed + 2-einsum x", quad_i16feed_x2),
]

base = None
for name, fn in VARIANTS:
    try:
        outs = jax.jit(fn)(x, banks)
        if base is None:
            base = outs
            md = 0
        else:
            md = max(
                int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
                for a, b in zip(outs, base)
            )
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:24s} {ms:7.3f} ms   maxdiff(i16) {md}", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
