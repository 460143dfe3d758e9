"""Probe: composed x-conv -> y-conv at 8K with FACTORED lane dims.

The 8K op profile (scripts/profile_flagship.py 4096 8192) shows 3.75 ms
of copy+reshape at the x->y conv boundary: the x conv's S3 output is
relayered ({1,2,3,0} -> {3,2,1,0}, 1.98 ms) and then reshaped
(3,4096,128,64) -> (3,64,64,8192) (lane merge + row split, 1.77 ms).
If the y conv instead consumes the x output with its (t2', t1') lane
dims UNFLATTENED (they ride the y einsums as trailing batch dims), the
lane merge never happens.  This probe times the two-conv composition
(one plane, i16 store epilogue) both ways, interleaved.
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
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (3, h, w), np.uint8)
x = jax.device_put(img)


def shipped(xx, bb):
    xf = xx.astype(jnp.float32)
    P01 = staged.conv_apply_lanes(xf, bb, "stx_", PREC)
    P01s = cas_ops.to_i16_storage(P01)
    P11 = staged.conv_apply_rows(
        cas_ops.from_i16_storage(P01s), bb, "sty_", PREC, in_max=2.0
    )
    return P01s, cas_ops.to_i16_storage(P11)


def factored(xx, bb):
    xf = xx.astype(jnp.float32)
    b1 = bb["stx_b1"]; mb = bb["stx_m"]; b3 = bb["stx_b3"]
    n2, n1 = b1.shape[0], mb.shape[2]
    nd = mb.shape[4]
    lead = xf.shape[:-1]
    xr = xf.reshape(lead + (n2, n1))
    y = jnp.einsum("ajc,...ab->...jcb", b1, xr, precision=PREC)
    y = jnp.einsum("cjbkd,...jcb->...kcd", mb, y, precision=PREC)
    y = jnp.einsum("kce,...kcd->...ed", b3, y, precision=PREC)
    # x output stays (..., h, E=t2', D=t1') — no lane merge
    P01s = cas_ops.to_i16_storage(y)
    ym = cas_ops.from_i16_storage(P01s)
    # y conv over the ROW axis with two trailing ride-along lane dims
    c1 = bb["sty_b1"]; cm = bb["sty_m"]; c3 = bb["sty_b3"]
    m2, m1 = c1.shape[0], cm.shape[2]
    md_ = cm.shape[4]
    lead2 = ym.shape[:-3]
    E, D = ym.shape[-2], ym.shape[-1]
    z = ym.reshape(lead2 + (m2, m1, E, D))
    z = jnp.einsum("ajc,...abEF->...jcbEF", c1, z, precision=PREC)
    z = jnp.einsum("cjbkd,...jcbEF->...kcdEF", cm, z, precision=PREC)
    z = jnp.einsum("kce,...kcdEF->...edEF", c3, z, precision=PREC)
    z = z.reshape(lead2 + (m2 * md_, E, D))
    return P01s, cas_ops.to_i16_storage(z)


o1 = jax.block_until_ready(jax.jit(shipped)(x, banks))
o2 = jax.block_until_ready(jax.jit(factored)(x, banks))
a = np.asarray(o1[1], np.int32)
b = np.asarray(o2[1], np.int32).reshape(a.shape)
print("maxdiff factored vs shipped (q2.14):", int(np.abs(a - b).max()), flush=True)

for rnd in (1, 2, 3):
    for name, fn in [("shipped ", shipped), ("factored", factored)]:
        ms = time_device(fn, x, aux=banks, k1=2, k2=8)
        print(f"pass{rnd} {name} xconv+yconv {ms:8.3f} ms", flush=True)
