"""Bisect the factored-route regression (gate: 46.8 vs 30.5 ms e2e at 8K)
and sweep the factored CAS band geometry.

Stages, all same-process:
  1. transform-only A/B (production r2c_quad_staged natural vs factored,
     i16 stores included) — confirms probe5 in production form.
  2. CAS-only A/B on prestored i16 planes: natural kernel vs factored
     kernel at several (bt, wsb) geometries (fresh closures per env —
     the jit cache ignores env changes).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops import cas_pallas
from vkresample_tpu.pipeline.bench_util import time_device

h, w = 4096, 8192
SHARPEN = 0.2
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
banks = staged.r2c_quad_staged_banks(plan)
banks = {k: jax.device_put(jnp.asarray(v)) for k, v in banks.items()}
n1, n2 = staged.factored_split(banks)
prec = staged.staged_precision()
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (3, h, w), np.uint8)
x = jax.device_put(img)


def tf_nat(xx, bb):
    return staged.r2c_quad_staged(
        xx, bb, prec,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
    )


def tf_fac(xx, bb):
    return staged.r2c_quad_staged(
        xx, bb, prec,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
        factored=True,
    )


for rnd in (1, 2):
    for name, fn in (("T nat", tf_nat), ("T fac", tf_fac)):
        ms = time_device(fn, x, aux=banks, k1=2, k2=8)
        print(f"pass{rnd} {name} transform {ms:8.3f} ms", flush=True)

# prestored planes for the CAS-only stage
Pn = jax.block_until_ready(jax.jit(tf_nat)(x, banks))
Pf = jax.block_until_ready(jax.jit(tf_fac)(x, banks))
Pn = [jax.device_put(p) for p in Pn]
Pf = [jax.device_put(p) for p in Pf]


def cas_nat_mk():
    def f(p, _aux):
        return cas_pallas.cas_parity4_planes_u2(*p, SHARPEN)

    return f


def cas_fac_mk():
    def f(p, _aux):
        return cas_pallas.cas_parity4_planes_u2(
            *p, SHARPEN, fac_split=(n1, n2)
        )

    return f


GEOMS = [
    ("nat default ", None, None, False),
    ("fac 32/2048 ", 32, 2048, True),
    ("fac 16/4096 ", 16, 4096, True),
    ("fac 48/1024 ", 48, 1024, True),
    ("fac 32/1024 ", 32, 1024, True),
]

for rnd in (1, 2, 3):
    for name, bt, wsb, fac in GEOMS:
        os.environ["VKRESAMPLE_QUAD_BT"] = str(bt or 0)
        os.environ["VKRESAMPLE_QUAD_WSB"] = str(wsb or 0)
        fn = cas_fac_mk() if fac else cas_nat_mk()
        args = tuple(Pf) if fac else tuple(Pn)
        try:
            ms = time_device(fn, args, k1=2, k2=8)
            print(f"pass{rnd} CAS {name} {ms:8.3f} ms", flush=True)
        except Exception as e:
            print(f"pass{rnd} CAS {name} FAILED: {str(e)[:120]}", flush=True)
os.environ["VKRESAMPLE_QUAD_BT"] = "0"
os.environ["VKRESAMPLE_QUAD_WSB"] = "0"
