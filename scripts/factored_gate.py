"""On-chip gate for the factored staged route at 8K->16K half.

Interleaved 3-pass A/B of the FULL device chain (staged quad transform
-> i16 Q2.14 stores -> quad CAS -> four u8 planes):
  A shipped  : natural layout transform + natural strip-slots CAS
  F factored : factored transform (S3 "...de", scrambled P00/signs) +
               factored-geometry strip-slots CAS (wrap slabs)
plus a one-time value check: F's planes, defactored on host, must equal
A's within 1 u8 code (both are <=1 LSB vs the fp64 oracle by the CPU
tests; the layouts share every arithmetic op, so on-chip diff should be
0 except CAS blend reassociation).
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
print(f"split n1={n1} n2={n2}", flush=True)
prec = staged.staged_precision()
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (3, h, w), np.uint8)
x = jax.device_put(img)


def shipped(xx, bb):
    Ps = staged.r2c_quad_staged(
        xx, bb, prec,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
    )
    return cas_pallas.cas_parity4_planes_u2(*Ps, SHARPEN)


def factored(xx, bb):
    Ps = staged.r2c_quad_staged(
        xx, bb, prec,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
        factored=True,
    )
    return cas_pallas.cas_parity4_planes_u2(
        *Ps, SHARPEN, fac_split=(n1, n2)
    )


oA = jax.block_until_ready(jax.jit(shipped)(x, banks))
oF = jax.block_until_ready(jax.jit(factored)(x, banks))
d = max(
    int(
        np.abs(
            np.asarray(
                staged.defactor_cols(b, n1, n2), np.int32
            )
            - np.asarray(a, np.int32)
        ).max()
    )
    for a, b in zip(oA, oF)
)
print(f"maxdiff factored vs shipped (u8): {d}", flush=True)

for rnd in (1, 2, 3):
    for name, fn in (("A shipped ", shipped), ("F factored", factored)):
        ms = time_device(fn, x, aux=banks, k1=2, k2=8)
        print(f"pass{rnd} {name} pipeline {ms:8.3f} ms", flush=True)
