"""Same-process A/B over Cooley-Tukey factor splits for the staged
convs at the big geometry (h=4096 rows conv, w=8192 lanes conv).

Motivation: staged_stage.py showed HIGH (bf16x3) ~= HIGHEST (bf16x6) on
the big staged transform — the matmul passes are NOT the bottleneck.
S1/S3 contract only K = n2 (32) / 2*kh (34) at the default n1=128
prefer, starving the 128-deep MXU; an (n1, n2) = (64, 64) split both
balances K (64/128/66) and LOWERS total stage FLOPs (S2 is ~n1-linear).
Also times the batched two-plane y conv vs two sequential calls.
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
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
st, ld = cas_ops.to_i16_storage, cas_ops.from_i16_storage

cy, _ = staged.y_kernel(h, plan.kept_lo_y, plan.kept_hi_y)
psi_o, _, _ = staged.x_kernels(w, plan.kept_lo_x)

# --- y (rows) conv: n1 sweep -------------------------------------------
for n1 in (256, 128, 64, 32):
    if h % n1:
        continue
    bb = jax.device_put(
        {k: jnp.asarray(v) for k, v in staged.conv_banks(cy, "sty_", n1=n1).items()}
    )

    def yconv(xx, bbb):
        xr = jnp.moveaxis(xx, -1, 0)
        P00s = st(xr.astype(jnp.float32) / 255.0)
        return st(staged.conv_apply_rows(ld(P00s), bbb, "sty_", HI))

    ms = time_device(yconv, x, aux=bb, k1=3, k2=12)
    print(f"y conv n1={n1:4d} n2={h//n1:4d}  {ms:9.3f} ms", flush=True)

# --- x (lanes) conv: n1 sweep ------------------------------------------
for n1 in (256, 128, 64, 32):
    if w % n1:
        continue
    bb = jax.device_put(
        {
            k: jnp.asarray(v)
            for k, v in staged.conv_banks(
                psi_o / 255.0, "stx_", n1=n1
            ).items()
        }
    )

    def xconv(xx, bbb):
        xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
        return st(staged.conv_apply_lanes(xr, bbb, "stx_", HI))

    ms = time_device(xconv, x, aux=bb, k1=3, k2=12)
    print(f"x conv n1={n1:4d} n2={w//n1:4d}  {ms:9.3f} ms", flush=True)
