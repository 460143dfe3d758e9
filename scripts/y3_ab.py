"""Interleaved A/B: 3-digit y bank (no bf16 residual pass) vs shipped.

The flagship op profile (scripts/profile_flagship.py) shows the two
bf16 residual matmuls of the shipped y route costing 0.157 ms — more
than all four int8 digit passes combined (0.14).  The residual exists
to cancel the 15-bit bank quantization; a 21-bit THREE-digit bank (the
x bank's encoding) needs no residual at all:

  Y ~= s*(d1*2^14 + d2*2^7 + d3),  P = 256*ph + (pl + 128)  (both exact)
  Y@P = s * sum_i w_i * (256*(di@ph) + di@pl + 128*colsum(di))

Variants drop the smallest cross products (weight relative to d1@ph*2^22):
  y3x6 — all six products
  y3x5 — drop d3@pl  (2^-22 relative)
  y3x4 — drop d2@pl too (2^-15 relative; err should stay ~0.01 LSB)

THREE interleaved passes; pass 2+ decides (device warm-up drift).
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
assert "yq_h" in banks
rng = np.random.default_rng(0)
P0 = jax.device_put(rng.integers(-2000, 2000, (3, h, w)).astype(np.int16))

# ---- 3-digit y bank (host build) ----------------------------------------
Ymain = (
    np.asarray(banks["yq_h"], np.float64) * 256.0
    + np.asarray(banks["yq_lo"], np.float64)
    + 128.0
) * float(banks["yq_scale"]) * 16384.0 + np.asarray(banks["yq_res"], np.float64)
SCALE21 = float((1 << 21) - (1 << 15))
SY = float(np.abs(Ymain).max())
Yq = np.round(Ymain / SY * SCALE21).astype(np.int64)
d1 = np.round(Yq / (1 << 14)).astype(np.int64)
rem = Yq - (d1 << 14)
d2 = np.round(rem / (1 << 7)).astype(np.int64)
d3 = rem - (d2 << 7)
assert all(-128 <= d.min() and d.max() <= 127 for d in (d1, d2, d3))
s3 = SY / SCALE21 / 16384.0  # bank scale * P descale
D = [jax.device_put(d.astype(np.int8)) for d in (d1, d2, d3)]
W = [float(1 << 14), float(1 << 7), 1.0]
# 128 * colsum(di) bank constants, weight-folded
csum = sum(wi * d.astype(np.float64).sum(axis=0) for wi, d in zip(W, (d1, d2, d3)))
CONST = jax.device_put((128.0 * csum).astype(np.float32))


def mm(a, b):
    return jnp.einsum("jm,...jn->...mn", a, b, preferred_element_type=jnp.int32)


def y3(p, keep):
    pi = p.astype(jnp.int32)
    ph = (pi >> 8).astype(jnp.int8)
    pl = ((pi & 255) - 128).astype(jnp.int8)
    acc = jnp.zeros((), jnp.float32)
    terms = []
    for i, (di, wi) in enumerate(zip(D, W)):
        t = mm(di, ph).astype(jnp.float32) * jnp.float32(wi * 256.0)
        terms.append(t)
        if ("d%d_pl" % (i + 1)) in keep:
            terms.append(mm(di, pl).astype(jnp.float32) * jnp.float32(wi))
    acc = sum(terms) + CONST[:, None]
    return (cas_ops.to_i16_storage(acc * jnp.float32(s3)),)


def y_shipped(p, aux):
    return (cas_ops.to_i16_storage(dense._quad_int8_y(p, banks)),)


refy = np.einsum("jm,cjn->cmn", Ymain, np.asarray(P0, np.float64) / 16384.0)


def check(outs):
    got = np.asarray(outs[0], np.float64) / 16384.0
    return float(np.abs(got - refy).max()) * 255.0


VARIANTS = [
    ("y shipped", y_shipped, None),
    ("y3x6", lambda p, a: y3(p, {"d1_pl", "d2_pl", "d3_pl"}), None),
    ("y3x5", lambda p, a: y3(p, {"d1_pl", "d2_pl"}), None),
    ("y3x4", lambda p, a: y3(p, {"d1_pl"}), None),
]
base = np.asarray(jax.jit(y_shipped)(P0, None)[0], np.int32)
for name, fn, _ in VARIANTS:
    outs = jax.block_until_ready(jax.jit(fn)(P0, None))
    dvs = int(np.abs(np.asarray(outs[0], np.int32) - base).max())
    print(f"{name:10s} err {check(outs):6.4f} LSB   vs-shipped {dvs} q2.14", flush=True)

for rnd in (1, 2, 3):
    for name, fn, _ in VARIANTS:
        ms = time_device(fn, P0, aux=None, k1=6, k2=40)
        print(f"pass{rnd} {name:10s} {ms:7.3f} ms", flush=True)
