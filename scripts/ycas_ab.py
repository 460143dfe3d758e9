"""Same-process A/B: fused y-matmul+weave+CAS kernel vs the split route.

Split route (round-1 default): XLA y matmul -> XLA weave -> plain CAS
kernel.  Fused route: the whole output stage per column strip in VMEM
(O and the woven image never exist in HBM).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas
from vkresample_tpu.ops.ycas_pallas import ycas_u2
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
import os

os.environ["VKRESAMPLE_YCAS_BANKS"] = "1"  # experiment-only banks
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def split_route(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    U, O = dense.r2c_rows(xr, bb, HIGH)
    v = dense.weave_rows(cas_ops.to_i16_storage(U), cas_ops.to_i16_storage(O), 2)
    return cas_quantize_pallas(v, 0.2)


def ycas_route(xx, bb, wb, bo, mm="bf16x3", i16=True):
    xr = jnp.moveaxis(xx, -1, 0)
    U, T2 = dense.r2c_x_only(xr, bb, HIGH)
    if i16:
        U = cas_ops.to_i16_storage(U)
    yt = bb["ycasYT2"] if mm == "bf16x3" else bb["ycasYT"]
    return ycas_u2(U, T2, yt, 0.2, Wb=wb, bo=bo, mm=mm)


routes = [
    ("split i16 (r1 default)", split_route),
    ("ycas bf16x3 Wb=256 bo=128", functools.partial(ycas_route, wb=256, bo=128)),
    ("ycas bf16x3 Wb=256 bo=64", functools.partial(ycas_route, wb=256, bo=64)),
    ("ycas highest Wb=256 bo=128", functools.partial(ycas_route, wb=256, bo=128, mm="highest")),
]

# on-chip correctness of the fused route first
got = np.asarray(jax.jit(functools.partial(ycas_route, wb=256, bo=128))(x, banks))
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print("ycas maxdiff vs oracle:", np.abs(got.astype(int) - want.astype(int)).max(), flush=True)

for name, fn in routes:
    try:
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:26s} {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
