"""Probe 2: can the factored x->y conv layout ship WITHOUT touching CAS?

factored_probe.py showed the composed x+y conv at 8K drops 12.2 -> 8.6 ms
when the x conv's (t2', t1') output dims ride the y einsums unflattened
(the 3.75 ms x->y boundary relayout disappears).  But the pipeline's CAS
kernels consume MERGED (h, w) i16 planes.  Three contracts, interleaved:

  A shipped   — natural ingest, merged everywhere (current default)
  B fac+merge — factored ingest (free: H2D linearizes row-major, and the
                x conv's input split (n2, n1) EQUALS its output (t2', t1')
                index map n = e*nd + d), factored compute, then reshape-
                merge the two STORED i16 planes (i16 relayout = half the
                f32 bytes).  CAS would be untouched.
  C factored  — no merges at all (upper bound; needs factored CAS).

All variants end at the same logical (P01s, P11s) i16 planes.
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
banks = {k: jax.device_put(jnp.asarray(v))
         for k, v in staged.r2c_quad_staged_banks(plan).items()}
PREC = jax.lax.Precision.HIGH
n2, n1 = banks["stx_b1"].shape[0], banks["stx_m"].shape[2]
print(f"x split n2={n2} n1={n1}", flush=True)
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (3, h, w), np.uint8)
x_nat = jax.device_put(img)
x_fac = jax.device_put(img.reshape(3, h, n2, n1))


def xconv_fac(xf, bb):
    b1, mb, b3 = bb["stx_b1"], bb["stx_m"], bb["stx_b3"]
    y = jnp.einsum("ajc,...ab->...jcb", b1, xf, precision=PREC)
    y = jnp.einsum("cjbkd,...jcb->...kcd", mb, y, precision=PREC)
    return jnp.einsum("kce,...kcd->...ed", b3, y, precision=PREC)


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


def shipped(xx, bb):
    xf = xx.astype(jnp.float32)
    P01 = staged.conv_apply_lanes(xf, bb, "stx_", PREC)
    P01s = cas_ops.to_i16_storage(P01)
    P11 = cas_ops.to_i16_storage(
        staged.conv_apply_rows(
            cas_ops.from_i16_storage(P01s), bb, "sty_", PREC, in_max=2.0
        )
    )
    return P01s, P11


def fac_merge(xx, bb):
    xf = xx.astype(jnp.float32)  # (3, h, n2, n1) — input split IS factored
    P01s_f = cas_ops.to_i16_storage(xconv_fac(xf, bb))
    P11s_f = cas_ops.to_i16_storage(
        yconv_fac(cas_ops.from_i16_storage(P01s_f), bb)
    )
    C = xx.shape[0]
    return (
        P01s_f.reshape(C, h, w),
        P11s_f.reshape(C, P11s_f.shape[1], w),
    )


def fac_pure(xx, bb):
    xf = xx.astype(jnp.float32)
    P01s_f = cas_ops.to_i16_storage(xconv_fac(xf, bb))
    P11s_f = cas_ops.to_i16_storage(
        yconv_fac(cas_ops.from_i16_storage(P01s_f), bb)
    )
    return P01s_f, P11s_f


oA = jax.block_until_ready(jax.jit(shipped)(x_nat, banks))
oB = jax.block_until_ready(jax.jit(fac_merge)(x_fac, banks))
oC = jax.block_until_ready(jax.jit(fac_pure)(x_fac, banks))
for name, o in (("B", oB), ("C", oC)):
    d = max(
        int(np.abs(np.asarray(a, np.int32).reshape(np.asarray(r).shape)
                   - np.asarray(r, np.int32)).max())
        for a, r in zip(o, oA)
    )
    print(f"maxdiff {name} vs shipped (q2.14): {d}", flush=True)

for rnd in (1, 2, 3):
    for name, fn, xx in [
        ("A shipped  ", shipped, x_nat),
        ("B fac+merge", fac_merge, x_fac),
        ("C factored ", fac_pure, x_fac),
    ]:
        ms = time_device(fn, xx, aux=banks, k1=2, k2=8)
        print(f"pass{rnd} {name} {ms:8.3f} ms", flush=True)
