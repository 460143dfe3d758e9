"""Probe 5: TRANSPOSED factored layout (d=t1' sublanes, e=t2' lanes).

probe4 killed the interleaved-e hybrid (24-29 ms vs nat 19).  The
remaining full-lane-tile candidate: keep the n1=64 banks and emit S3 as
its NATURAL matmul order "...de" (M=d free-of-activation, N=e
free-of-bank) — the fac64 form's "...ed" asks XLA for a transposed dot
output.  Planes then live as (…, h, 64, 128) with e=t2' in LANES (full
CAS tiles); plane[p, q] holds column n = q*64 + p.  P00 needs the raw
image in the same order: one u8 swapaxes of the (h, 128, 64) ingest
view (the only relayout in the arm — charged here).
Arms: A nat / B fac64 / T transposed.
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
SG = (-1.0) ** np.arange(w)


def xconv_fac64(xf, bb, out):
    b1, mb, b3 = bb["stx_b1"], bb["stx_m"], bb["stx_b3"]
    y = jnp.einsum("ajc,...ab->...jcb", b1, xf, precision=PREC)
    y = jnp.einsum("cjbkd,...jcb->...kcd", mb, y, precision=PREC)
    return jnp.einsum(f"kce,...kcd->...{out}", b3, y, precision=PREC)


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


def p00_terms(xx, shape_tail, perm=None):
    sg = np.where(np.arange(w) % 2 == 0, 1, -1).astype(np.int32).reshape(128, 64)
    sf = SG.reshape(128, 64)
    if perm:
        sg, sf = sg.T.copy(), sf.T.copy()
    if shape_tail == 1:
        sg, sf = sg.reshape(-1), sf.reshape(-1)
    red = (-1,) if shape_tail == 1 else (-2, -1)
    q = jnp.sum(
        xx.astype(jnp.int32) * jnp.asarray(sg), axis=red, keepdims=True
    ).astype(jnp.float32)
    return xx.astype(jnp.float32) * jnp.float32(1.0 / 255.0) - (
        jnp.asarray(sf, jnp.float32) * q
    ) * jnp.float32(1.0 / (255.0 * w))


def nat(xx, bb):
    xf = xx.astype(jnp.float32)
    P01s = cas_ops.to_i16_storage(staged.conv_apply_lanes(xf, bb, "stx_", PREC))
    P11s = cas_ops.to_i16_storage(
        staged.conv_apply_rows(
            cas_ops.from_i16_storage(P01s), bb, "sty_", PREC, in_max=2.0
        )
    )
    P00s = cas_ops.to_i16_storage(p00_terms(xx, 1))
    P10s = cas_ops.to_i16_storage(
        staged.conv_apply_rows(
            cas_ops.from_i16_storage(P00s), bb, "sty_", PREC, in_max=2.0
        )
    )
    return P00s, P01s, P10s, P11s


def fac64(xx, bb):
    xf = xx.astype(jnp.float32)
    P01s = cas_ops.to_i16_storage(xconv_fac64(xf, bb, "ed"))
    P11s = cas_ops.to_i16_storage(yconv_fac(cas_ops.from_i16_storage(P01s), bb))
    P00s = cas_ops.to_i16_storage(p00_terms(xx, 2))
    P10s = cas_ops.to_i16_storage(yconv_fac(cas_ops.from_i16_storage(P00s), bb))
    return P00s, P01s, P10s, P11s


def transposed(xx, bb):
    xf = xx.astype(jnp.float32)
    P01s = cas_ops.to_i16_storage(xconv_fac64(xf, bb, "de"))
    P11s = cas_ops.to_i16_storage(yconv_fac(cas_ops.from_i16_storage(P01s), bb))
    xT = jnp.swapaxes(xx, -1, -2)  # u8 (…, 64, 128): the one relayout
    P00s = cas_ops.to_i16_storage(p00_terms(xT, 2, perm=True))
    P10s = cas_ops.to_i16_storage(yconv_fac(cas_ops.from_i16_storage(P00s), bb))
    return P00s, P01s, P10s, P11s


oA = jax.block_until_ready(jax.jit(nat)(x_nat, banks))
oT = jax.block_until_ready(jax.jit(transposed)(x_f64, banks))
d = max(
    int(np.abs(
        np.asarray(t, np.int32).transpose(0, 1, 3, 2).reshape(np.asarray(r).shape)
        - np.asarray(r, np.int32)
    ).max())
    for t, r in zip(oT, oA)
)
print(f"maxdiff transposed vs nat (q2.14): {d}", flush=True)

for rnd in (1, 2, 3):
    for name, fn, xx in [
        ("A nat       ", nat, x_nat),
        ("B fac64     ", fac64, x_f64),
        ("T transposed", transposed, x_f64),
    ]:
        ms = time_device(fn, xx, aux=banks, k1=2, k2=8)
        print(f"pass{rnd} {name} 4-plane transform {ms:8.3f} ms", flush=True)
