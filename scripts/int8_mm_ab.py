"""Same-process A/B: int8 MXU matmuls for the quad transform.

int8 MXU throughput is 2x bf16, and the pipeline's operands are already
integer-friendly:
  - y activation = the stored int16 Q2.14 planes -> two int8 digits via
    shift/mask (vs HIGH's 3 bf16 passes from the dequantized f32)
  - x activation = uint8 pixels: (x - 128) is int8 EXACT; the +128 shift
    is a precomputed rank-1 column correction
  - banks -> fixed-point digits at bank-build time (free)

y via digits: P = (phi*256 + plo)/2^14, Y = S*(yhi*256 + ylo)/2^14:
  4 int8 matmuls (2 bf16-pass equivalents) or 3 dropping lo*lo.
x via 3 base-128 digits of the bank: 3 int8 matmuls = 1.5 bf16-pass
  equivalents vs the current stacked hi|lo bf16 (2 passes).

Reports ms + err (u8 LSB) vs the f64 contraction of the same operands.
"""
import sys

import os as _os
_os.environ.setdefault("VKRESAMPLE_Y_DIGITS", "2")  # this record reconstructs the round-2 yq_h/yq_lo banks

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

Ps = jax.block_until_ready(
    jax.jit(lambda xx, bb: dense.r2c_quad(jnp.moveaxis(xx, -1, -3), bb, HIGH, **CODEC))(
        x, banks
    )
)
P0, P1 = Ps[0], Ps[1]

# ---- y: int8 digits ----------------------------------------------------
Yn = np.asarray(banks["Ymat_ns"], np.float64)[:h]  # main rows only
S = np.abs(Yn).max()
Yq = np.round(Yn / S * 16384.0).astype(np.int32)
yhi_np = np.clip((Yq + 128) >> 8, -128, 127).astype(np.int8)
ylo_np = (Yq - yhi_np.astype(np.int32) * 256).astype(np.int8)
yhi = jax.device_put(yhi_np)
ylo = jax.device_put(ylo_np)
YSCALE = S / (16384.0 * 16384.0 * 16384.0)  # Y-scale * P-descale(2^14) fold


def mm8(a, b):
    return jnp.einsum("jm,cjn->cmn", a, b, preferred_element_type=jnp.int32)


def y_int8(p0, aux, drop_lolo=False):
    """NOTE: this rounded digit split wraps plo in int8 for near-saturated
    planes (pi >= 32640 clips phi to 127, leaving plo in [128, 255]) — it
    was superseded by the EXACT offset-digit algebra shipped in
    dense._quad_int8_y (timed below as 'y int8 shipped'), kept here only
    as the record of the original decision measurement."""
    (p1,) = aux
    outs = []
    for p in (p0, p1):
        pi = p.astype(jnp.int32)
        phi = jnp.clip((pi + 128) >> 8, -128, 127).astype(jnp.int8)
        plo = (pi - phi.astype(jnp.int32) * 256).astype(jnp.int8)
        acc = mm8(yhi, phi).astype(jnp.float32) * 65536.0
        acc = acc + (mm8(yhi, plo) + mm8(ylo, phi)).astype(jnp.float32) * 256.0
        if not drop_lolo:
            acc = acc + mm8(ylo, plo).astype(jnp.float32)
        outs.append(cas_ops.to_i16_storage(acc * jnp.float32(YSCALE * 16384.0)))
    return tuple(outs)


def y_int8_shipped(p0, aux):
    """The exact shipped route (dense._quad_int8_y: offset digits +
    bf16 residual pass), measured on the same operands."""
    (p1,) = aux
    return tuple(
        cas_ops.to_i16_storage(dense._quad_int8_y(p, banks)) for p in (p0, p1)
    )


def y_high(p0, aux):
    (p1,) = aux
    Ym = banks["Ymat_ns"][:h]
    return tuple(
        cas_ops.to_i16_storage(
            jnp.einsum(
                "jm,cjn->cmn", Ym, cas_ops.from_i16_storage(p), precision=HIGH
            )
        )
        for p in (p0, p1)
    )


# f64 reference of the same contraction (main rows, no corrections)
ref = [
    np.einsum("jm,cjn->cmn", Yn, np.asarray(p, np.float64) / 16384.0)
    for p in (P0, P1)
]


def check_y(outs):
    return max(
        float(np.abs(np.asarray(o, np.float64) / 16384.0 - r).max()) * 255.0
        for o, r in zip(outs, ref)
    )


Y_VARIANTS = [
    ("y HIGH (current)", y_high),
    ("y int8 x4", lambda p0, aux: y_int8(p0, aux, False)),
    ("y int8 x3", lambda p0, aux: y_int8(p0, aux, True)),
]
if "xq_d1" in banks:
    Y_VARIANTS.append(("y int8 shipped", y_int8_shipped))
for name, fn in Y_VARIANTS:
    try:
        outs = jax.jit(fn)(P0, (P1,))
        err = check_y(outs)
        ms = time_device(fn, P0, aux=(P1,), k1=4, k2=24)
        print(f"{name:18s} {ms:7.3f} ms   err {err:6.3f} LSB", flush=True)
    except Exception as e:
        print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

# ---- x: 3-digit int8 bank ----------------------------------------------
A = None
# reconstruct alpha_odd/255 in f64 from the hi/lo banks
A = np.asarray(banks["alpha_odd_hi"], np.float64) + np.asarray(
    banks["alpha_odd_lo"], np.float64
)
SX = np.abs(A).max()
SCALE21 = float((1 << 21) - (1 << 15))  # headroom so the top digit fits int8
Aq = np.round(A / SX * SCALE21).astype(np.int64)
d1 = np.round(Aq / (1 << 14)).astype(np.int64)
r_ = Aq - (d1 << 14)
d2 = np.round(r_ / (1 << 7)).astype(np.int64)
d3 = (r_ - (d2 << 7)).astype(np.int64)
assert max(np.abs(d1).max(), np.abs(d2).max(), np.abs(d3).max()) <= 127, (
    np.abs(d1).max(), np.abs(d2).max(), np.abs(d3).max()
)
D1 = jax.device_put(d1.astype(np.int8))
D2 = jax.device_put(d2.astype(np.int8))
D3 = jax.device_put(d3.astype(np.int8))
XS = SX / SCALE21
Arec = (d1.astype(np.float64) * (1 << 14) + d2 * (1 << 7) + d3) * XS
corr128 = jax.device_put((128.0 * Arec.sum(axis=0)).astype(np.float32))


def x_int8(xx, aux):
    xr = jnp.moveaxis(xx, -1, -3)
    xs = (xr.astype(jnp.int32) - 128).astype(jnp.int8)

    def mm(dd):
        return jnp.einsum(
            "chk,kn->chn", xs, dd, preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    acc = mm(D1) * jnp.float32(1 << 14) + mm(D2) * jnp.float32(1 << 7) + mm(D3)
    P01 = acc * jnp.float32(XS) + corr128
    return (cas_ops.to_i16_storage(P01),)


def x_bf16(xx, aux):
    xr = jnp.moveaxis(xx, -1, -3)
    bank_dt = banks["alpha_odd_hi"].dtype
    xb = xr.astype(bank_dt)
    a_cat = jnp.concatenate([banks["alpha_odd_hi"], banks["alpha_odd_lo"]], axis=0)
    x_cat = jnp.concatenate([xb, xb], axis=-1)
    P01 = jnp.einsum(
        "...hk,kn->...hn", x_cat, a_cat, preferred_element_type=jnp.float32
    )
    return (cas_ops.to_i16_storage(P01),)


xrn = np.moveaxis(img, -1, 0).astype(np.float64)
refx = np.einsum("chk,kn->chn", xrn, A)


def check_x(outs):
    return float(
        np.abs(np.asarray(outs[0], np.float64) / 16384.0 - refx).max()
    ) * 255.0


for name, fn in [("x bf16 hi|lo (cur)", x_bf16), ("x int8 3-digit", x_int8)]:
    try:
        outs = jax.jit(fn)(x, None)
        err = check_x(outs)
        ms = time_device(fn, x, aux=None, k1=4, k2=24)
        print(f"{name:18s} {ms:7.3f} ms   err {err:6.3f} LSB", flush=True)
    except Exception as e:
        print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
