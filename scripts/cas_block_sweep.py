"""Same-process sweep: quad CAS band height after the rsqrt change.

The kernel's live f32 temporaries in _quad_planes (~24 band-sized tiles)
scale with bt, so SMALLER bands may now win (less VMEM pressure, more
grid steps); bt=128 blows VMEM outright.  Also rechecks the flagship
end-to-end number with the i16feed transform.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


@jax.jit
def make_planes(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    return dense.r2c_quad(
        xr, bb, HIGH,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
    )


Ps = jax.block_until_ready(make_planes(x, banks))

for br in (16, 32, 48, 64, 96):
    def fn(p0, aux, _br=br):
        p1, p2, p3 = aux
        return cas_parity4_planes_u2(p0, p1, p2, p3, 0.2, block_rows=_br)

    try:
        ms = time_device(fn, Ps[0], aux=Ps[1:], k1=4, k2=24)
        print(f"quad CAS bt={br:3d}   {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(f"quad CAS bt={br:3d}   FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)

# end-to-end flagship with the integrated pipeline (planes out)
pipe = functools.partial(
    _pipeline, plan=plan, engine=plan.resolve_engine(),
    planar_out=True, planes_out=True,
)
ms = time_device(pipe, x, aux=banks, k1=8, k2=40)
print(f"pipeline end-to-end   {ms:7.3f} ms", flush=True)
