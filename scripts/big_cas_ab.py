"""Same-process A/B of the big-tier quad CAS stage (planes at
(3, 4096, 8192) i16 — the 8K->16K geometry, 15.4 ms in the round-2
stage split).

The strip kernel's cost model is halo amplification:
((bt+2*pad)/bt) * ((Wsb+256)/Wsb) reads+compute per output element —
2.25x at the default (bt=32, Wsb=2048) vs 1.5x for the flagship
full-width kernel (which measures 21.6 ps/px vs the strip's 38.5).
Sweeps (bt, Wsb) within the VMEM cap and races the pure-XLA full-array
evaluation (VKRESAMPLE_QUAD_CAS=xla).
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device

rng = np.random.default_rng(0)
c, h, wh = 3, 4096, 8192
planes = tuple(
    jax.device_put(rng.integers(-18000, 18000, (c, h, wh)).astype(np.int16))
    for _ in range(4)
)

base = None
for name, env in [
    ("bt64 wsb2048 (default)", {}),
    ("bt128 wsb2048", {"VKRESAMPLE_QUAD_BT": "128"}),
    ("bt128 wsb1024", {"VKRESAMPLE_QUAD_BT": "128", "VKRESAMPLE_QUAD_WSB": "1024"}),
    ("bt256 wsb1024", {"VKRESAMPLE_QUAD_BT": "256", "VKRESAMPLE_QUAD_WSB": "1024"}),
]:
    def run(x, aux):
        return cas_parity4_planes_u2(x, *aux, 0.2)

    for k, v in env.items():
        os.environ[k] = v
    try:
        got = [
            np.asarray(p)
            for p in jax.jit(functools.partial(cas_parity4_planes_u2, sharpen=0.2))(
                *planes
            )
        ]
        if base is None:
            base = got
        md = max(
            np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
            for a, b in zip(got, base)
        )
        ms = time_device(run, planes[0], aux=planes[1:], k1=4, k2=16)
        print(f"{name:24s} {ms:9.3f} ms  maxdiff-vs-default {md}", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
