"""Interleaved same-process A/B: STACKED int8 digit matmuls (flagship).

The shipped int8 routes issue separate MXU passes per digit product
(x: 3 matmuls over the same activation; y: 4 matmuls + bf16 residual).
Round-2 verdict weak-#4 measured the x pass at ~38% int8 MFU and asked
for a look at fusing the digit combines.  K-stacking was tried and
rejected (round-2, scripts/ record); these are the UNTRIED groupings —
same FLOPs, fewer MXU dispatches, identical digit algebra:

  x ncat : one (k, 3n) bank  = [d1 | d2 | d3]   -> 1 matmul, slice-combine
  y mcat : one (j, 2m) bank  = [yh ; yl]        -> 2 matmuls (vs 4)
  y full : (j,2m) bank @ (j,2n) [ph | pl] acts  -> 1 matmul (all 4 products)

Grouped digit products are algebraically identical to the shipped form,
so err vs the f64 contraction must match the shipped route's.
THREE interleaved passes (slots_flagship_ab2 pattern): warm-up drift
makes single-pass orderings lie; pass 2+ decides.
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

h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = make_device_banks(plan, Engine.MXU)
assert "xq_d1" in banks, "int8 banks required for this A/B"
rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(np.moveaxis(img, -1, 0).copy())  # (c, h, w) raw u8

# stored int16 Q2.14 plane (the y activation).  Range kept small enough
# that the y output stays inside the Q2.14 clip window — the err check
# must measure digit algebra, not store saturation.
P0 = jax.device_put(rng.integers(-2000, 2000, (3, h, w)).astype(np.int16))

# ---- x variants ---------------------------------------------------------
Dcat = jax.device_put(
    np.concatenate(
        [np.asarray(banks["xq_d" + str(i)]) for i in (1, 2, 3)], axis=1
    )
)
N = int(banks["xq_d1"].shape[1])


def x_shipped(xx, aux):
    return (cas_ops.to_i16_storage(dense._quad_int8_x(xx, banks, "xq")),)


def x_ncat(xx, aux):
    xs = (xx.astype(jnp.int32) - 128).astype(jnp.int8)
    o = jnp.einsum(
        "...hk,kn->...hn", xs, Dcat, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    acc = (
        o[..., :N] * jnp.float32(1 << 14)
        + o[..., N : 2 * N] * jnp.float32(1 << 7)
        + o[..., 2 * N :]
    )
    return (
        cas_ops.to_i16_storage(acc * banks["xq_scale"] + banks["xq_corr"]),
    )


# f64 reference of the same contraction
Arec = (
    np.asarray(banks["xq_d1"], np.float64) * (1 << 14)
    + np.asarray(banks["xq_d2"], np.float64) * (1 << 7)
    + np.asarray(banks["xq_d3"], np.float64)
) * float(banks["xq_scale"])
refx = np.einsum("chk,kn->chn", np.moveaxis(img, -1, 0).astype(np.float64), Arec)


def check_x(outs):
    got = np.asarray(outs[0], np.float64) / 16384.0
    return float(np.abs(got - refx).max()) * 255.0


# ---- y variants ---------------------------------------------------------
M = int(banks["yq_h"].shape[1])
Ymcat = jax.device_put(
    np.concatenate(
        [np.asarray(banks["yq_h"]), np.asarray(banks["yq_lo"])], axis=1
    )
)


def _y_epilogue(acc, pi):
    psum = jnp.sum(pi, axis=-2, keepdims=True).astype(jnp.float32)
    acc = acc + jnp.float32(128.0) * psum + banks["yq_comp"][:, None]
    out = acc * banks["yq_scale"]
    pb = (pi.astype(jnp.float32) * jnp.float32(1.0 / 16384.0)).astype(
        jnp.bfloat16
    )
    return out + jnp.einsum(
        "jm,...jn->...mn",
        banks["yq_res"],
        pb,
        preferred_element_type=jnp.float32,
    )


def y_shipped(p, aux):
    return (cas_ops.to_i16_storage(dense._quad_int8_y(p, banks)),)


def y_mcat(p, aux):
    pi = p.astype(jnp.int32)
    ph = (pi >> 8).astype(jnp.int8)
    pl = ((pi & 255) - 128).astype(jnp.int8)

    def mm(b):
        return jnp.einsum(
            "jm,...jn->...mn", Ymcat, b, preferred_element_type=jnp.int32
        )

    oh = mm(ph)  # [yh@ph ; yl@ph] stacked along m
    ol = mm(pl)  # [yh@pl ; yl@pl]
    acc = oh[..., :M, :].astype(jnp.float32) * jnp.float32(65536.0)
    acc = acc + (ol[..., :M, :] + oh[..., M:, :]).astype(
        jnp.float32
    ) * jnp.float32(256.0)
    acc = acc + ol[..., M:, :].astype(jnp.float32)
    return (cas_ops.to_i16_storage(_y_epilogue(acc, pi)),)


def y_full(p, aux):
    pi = p.astype(jnp.int32)
    ph = (pi >> 8).astype(jnp.int8)
    pl = ((pi & 255) - 128).astype(jnp.int8)
    pcat = jnp.concatenate([ph, pl], axis=-1)  # (..., j, 2n)
    n = pi.shape[-1]
    o = jnp.einsum(
        "jm,...jn->...mn", Ymcat, pcat, preferred_element_type=jnp.int32
    )
    acc = o[..., :M, :n].astype(jnp.float32) * jnp.float32(65536.0)
    acc = acc + (o[..., :M, n:] + o[..., M:, :n]).astype(
        jnp.float32
    ) * jnp.float32(256.0)
    acc = acc + o[..., M:, n:].astype(jnp.float32)
    return (cas_ops.to_i16_storage(_y_epilogue(acc, pi)),)


Yref = (
    np.asarray(banks["yq_h"], np.float64) * 256.0
    + np.asarray(banks["yq_lo"], np.float64)
    + 128.0
) * float(banks["yq_scale"]) * 16384.0 + np.asarray(banks["yq_res"], np.float64)
refy = np.einsum(
    "jm,cjn->cmn", Yref, np.asarray(P0, np.float64) / 16384.0
)


def check_y(outs):
    got = np.asarray(outs[0], np.float64) / 16384.0
    return float(np.abs(got - refy).max()) * 255.0


base = {
    "x": np.asarray(jax.jit(x_shipped)(x, None)[0], np.int32),
    "y": np.asarray(jax.jit(y_shipped)(P0, None)[0], np.int32),
}
for name, fn, arg, chk, bk in [
    ("x shipped 3mm", x_shipped, x, check_x, "x"),
    ("x ncat   1mm", x_ncat, x, check_x, "x"),
    ("y shipped 4mm", y_shipped, P0, check_y, "y"),
    ("y mcat   2mm", y_mcat, P0, check_y, "y"),
    ("y full   1mm", y_full, P0, check_y, "y"),
]:
    outs = jax.block_until_ready(jax.jit(fn)(arg, None))
    dvs = int(np.abs(np.asarray(outs[0], np.int32) - base[bk]).max())
    print(
        f"{name:15s} err {chk(outs):6.3f} LSB   vs-shipped {dvs} q2.14",
        flush=True,
    )

for rnd in (1, 2, 3):
    for name, fn, arg in [
        ("x shipped 3mm", x_shipped, x),
        ("x ncat   1mm", x_ncat, x),
        ("y shipped 4mm", y_shipped, P0),
        ("y mcat   2mm", y_mcat, P0),
        ("y full   1mm", y_full, P0),
    ]:
        try:
            ms = time_device(fn, arg, aux=None, k1=6, k2=40)
            print(f"pass{rnd} {name:15s} {ms:7.3f} ms", flush=True)
        except Exception as e:
            print(f"pass{rnd} {name:15s} FAILED: {str(e)[:160]}", flush=True)
