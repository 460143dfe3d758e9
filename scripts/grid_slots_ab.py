"""Same-process A/B: slot-resident vs aligned-halo strip kernel for the
u-generic grid CAS at the big u=3 geometry (9 planes of (3, 2048, 4096)
i16 = 2048x4096 -> 6144x12288).

The grid kernel's bands shrink as u grows (VMEM holds u^2 planes), so
the aligned-halo scheme's 2*pad rows-per-side overhead is proportionally
worse than the quad kernel's — the slots scheme (exact-bt DMA, halos
from neighbor slots) should gain more here than the ~5% it bought at
u=2 (scripts/slots_ab.py).
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.ops.cas_pallas import cas_parity_grid_planes
from vkresample_tpu.pipeline.bench_util import time_device

rng = np.random.default_rng(0)
u, c, h, wp = 3, 3, 2048, 4096
planes = tuple(
    jax.device_put(rng.integers(-18000, 18000, (c, h, wp)).astype(np.int16))
    for _ in range(u * u)
)

base = None
for name, env in [
    ("halo  (default)", {}),
    ("slots", {"VKRESAMPLE_GRID_STRIP": "slots"}),
    ("slots bt2x", {"VKRESAMPLE_GRID_STRIP": "slots",
                    "VKRESAMPLE_GRID_BT": "64"}),
]:
    def run(x, aux):
        return cas_parity_grid_planes((x,) + aux, u, 0.2)

    for k, v in env.items():
        os.environ[k] = v
    try:
        got = [
            np.asarray(p)
            for p in jax.jit(
                functools.partial(cas_parity_grid_planes, u=u, sharpen=0.2)
            )(planes)
        ]
        if base is None:
            base = got
        md = max(
            np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
            for a, b in zip(got, base)
        )
        ms = time_device(run, planes[0], aux=planes[1:], k1=4, k2=12)
        print(f"{name:18s} {ms:9.3f} ms  maxdiff-vs-default {md}", flush=True)
    except Exception as e:
        print(f"{name:18s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
