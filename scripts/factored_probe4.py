"""Probe 4: the interleaved-e hybrid — n1=64 conv banks, D=128 layout.

probe3: factored n1=64 transform is -4.8 ms (14.3 vs 19.1) but its
(…, E=128, D=64) planes would half-empty the CAS kernel's lane tiles;
n1=128 keeps full tiles but gives back half the win (17.2).  Hybrid:
all arrays live in (…, E'=w/128, 128) — the x conv keeps its n1=64
banks by splitting them over the interleave parity l = d'//64
(a = 2e' + l, d = d' % 64, n = e'*128 + d'):

  S1:  sum of two half-K dots on the lane halves x[..., :64] / [64:]
       with the e-parity bank slices b1[0::2] / b1[1::2]
  S3:  two e-parity output dots (b3[:,:,0::2] / [1::2]) + lane concat

No relayout anywhere: the (h, w/128, 128) u8 ingest view is free at
H2D, P00 is elementwise in the same layout, the y conv rides (E', 128)
as trailing batch dims, and CAS gets full 128-lane tiles.
Arms: A nat / B fac64 (probe3 refs) / E hybrid.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device

h, w = 4096, 8192
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = staged.r2c_quad_staged_banks(plan)
banks = {k: jax.device_put(jnp.asarray(v)) for k, v in banks.items()}
PREC = jax.lax.Precision.HIGH
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (3, h, w), np.uint8)
x_nat = jax.device_put(img)
x_f64 = jax.device_put(img.reshape(3, h, 128, 64))
x_f128 = jax.device_put(img.reshape(3, h, w // 128, 128))
SG = (-1.0) ** np.arange(w)


def xconv_fac64(xf, bb):
    b1, mb, b3 = bb["stx_b1"], bb["stx_m"], bb["stx_b3"]
    y = jnp.einsum("ajc,...ab->...jcb", b1, xf, precision=PREC)
    y = jnp.einsum("cjbkd,...jcb->...kcd", mb, y, precision=PREC)
    return jnp.einsum("kce,...kcd->...ed", b3, y, precision=PREC)


def xconv_hybrid(xf, bb):
    b1, mb, b3 = bb["stx_b1"], bb["stx_m"], bb["stx_b3"]
    y = jnp.einsum(
        "Ejc,...Eb->...jcb", b1[0::2], xf[..., :64], precision=PREC
    ) + jnp.einsum(
        "Ejc,...Eb->...jcb", b1[1::2], xf[..., 64:], precision=PREC
    )
    y = jnp.einsum("cjbkd,...jcb->...kcd", mb, y, precision=PREC)
    z0 = jnp.einsum("kcE,...kcd->...Ed", b3[:, :, 0::2], y, precision=PREC)
    z1 = jnp.einsum("kcE,...kcd->...Ed", b3[:, :, 1::2], y, precision=PREC)
    return jnp.concatenate([z0, z1], axis=-1)


def yconv_fac(ym, bb):
    c1, cm, c3 = bb["sty_b1"], bb["sty_m"], bb["sty_b3"]
    m2, m1, md_ = c1.shape[0], cm.shape[2], cm.shape[4]
    lead2 = ym.shape[:-3]
    E, D = ym.shape[-2], ym.shape[-1]
    z = ym.reshape(lead2 + (m2, m1, E, D))
    z = jnp.einsum("ajc,...abEF->...jcbEF", c1, z, precision=PREC)
    z = jnp.einsum("cjbkd,...jcbEF->...kcdEF", cm, z, precision=PREC)
    z = jnp.einsum("kce,...kcdEF->...edEF", c3, z, precision=PREC)
    return z.reshape(lead2 + (m2 * md_, E, D))


def p00_of(xx, xf, shape_tail):
    isign = jnp.asarray(
        np.where(np.arange(w) % 2 == 0, 1, -1).astype(np.int32).reshape(shape_tail)
    )
    red = tuple(range(-len(shape_tail), 0))
    q = jnp.sum(xx.astype(jnp.int32) * isign, axis=red, keepdims=True).astype(
        jnp.float32
    )
    sgn = jnp.asarray(SG.reshape(shape_tail), jnp.float32)
    return xf * jnp.float32(1.0 / 255.0) - (sgn * q) * jnp.float32(
        1.0 / (255.0 * w)
    )


def nat(xx, bb):
    xf = xx.astype(jnp.float32)
    P01s = cas_ops.to_i16_storage(staged.conv_apply_lanes(xf, bb, "stx_", PREC))
    P11s = cas_ops.to_i16_storage(
        staged.conv_apply_rows(
            cas_ops.from_i16_storage(P01s), bb, "sty_", PREC, in_max=2.0
        )
    )
    P00s = cas_ops.to_i16_storage(p00_of(xx, xf, (w,)))
    P10s = cas_ops.to_i16_storage(
        staged.conv_apply_rows(
            cas_ops.from_i16_storage(P00s), bb, "sty_", PREC, in_max=2.0
        )
    )
    return P00s, P01s, P10s, P11s


def make_fac(xconv, n2_, n1_):
    def fac(xx, bb):
        xf = xx.astype(jnp.float32)
        P01s = cas_ops.to_i16_storage(xconv(xf, bb))
        P11s = cas_ops.to_i16_storage(yconv_fac(cas_ops.from_i16_storage(P01s), bb))
        P00s = cas_ops.to_i16_storage(p00_of(xx, xf, (n2_, n1_)))
        P10s = cas_ops.to_i16_storage(yconv_fac(cas_ops.from_i16_storage(P00s), bb))
        return P00s, P01s, P10s, P11s

    return fac


fac64 = make_fac(xconv_fac64, 128, 64)
hybrid = make_fac(xconv_hybrid, w // 128, 128)

oA = jax.block_until_ready(jax.jit(nat)(x_nat, banks))
oE = jax.block_until_ready(jax.jit(hybrid)(x_f128, banks))
d = max(
    int(np.abs(np.asarray(a, np.int32).reshape(np.asarray(r).shape)
               - np.asarray(r, np.int32)).max())
    for a, r in zip(oE, oA)
)
print(f"maxdiff hybrid vs nat (q2.14): {d}", flush=True)

for rnd in (1, 2, 3):
    for name, fn, xx in [
        ("A nat   ", nat, x_nat),
        ("B fac64 ", fac64, x_f64),
        ("E hybrid", hybrid, x_f128),
    ]:
        ms = time_device(fn, xx, aux=banks, k1=2, k2=8)
        print(f"pass{rnd} {name} 4-plane transform {ms:8.3f} ms", flush=True)
