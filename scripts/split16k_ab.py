"""Split A/B for the 16K lanes conv (w=16384): sqrt gives (128,128);
(64,256) trades S2 FLOPs down for more S1 — decide empirically."""
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

HI = jax.lax.Precision.HIGH
h, w = 8192, 16384
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO,
    channels=1,
)
img = np.random.default_rng(0).integers(0, 256, (h, w, 1), np.uint8)
x = jax.device_put(img)
st = cas_ops.to_i16_storage
psi_o, _, _ = staged.x_kernels(w, plan.kept_lo_x)
cy, _ = staged.y_kernel(h, plan.kept_lo_y, plan.kept_hi_y)

for n1 in (256, 128, 64):
    bb = jax.device_put({
        k: jnp.asarray(v)
        for k, v in staged.conv_banks(psi_o / 255.0, "stx_", n1=n1).items()
    })

    def xconv(xx, bbb):
        xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
        return st(staged.conv_apply_lanes(xr, bbb, "stx_", HI))

    ms = time_device(xconv, x, aux=bb, k1=2, k2=8)
    print(f"x16k conv n1={n1:4d} n2={w//n1:4d}  {ms:9.3f} ms", flush=True)

for n1 in (128, 64):
    bb = jax.device_put({
        k: jnp.asarray(v)
        for k, v in staged.conv_banks(cy, "sty_", n1=n1).items()
    })

    def yconv(xx, bbb):
        xr = jnp.moveaxis(xx, -1, 0)
        P = st(xr.astype(jnp.float32) / 255.0)
        return st(staged.conv_apply_rows(cas_ops.from_i16_storage(P), bbb, "sty_", HI))

    ms = time_device(yconv, x, aux=bb, k1=2, k2=8)
    print(f"y8k  conv n1={n1:4d} n2={h//n1:4d}  {ms:9.3f} ms", flush=True)
