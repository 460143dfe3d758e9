"""Same-process A/B: quad CAS kernel with the int16 extremes tree
(VKRESAMPLE_CAS_TREE=i16; 2x VPU lanes on the min/max tree, bit-exact)
vs the f32 tree, at the flagship quad shape and the big strip shape.

Round-2 verdict item 3 asked for a cheaper CAS stencil: flagship CAS
stage = 0.54 ms of 1.32, big-tier CAS = 15.4 ms of 65.
"""
import functools
import os
import sys

import jax
import numpy as np
from jax import numpy as jnp

sys.path.insert(0, ".")
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device

rng = np.random.default_rng(0)
for name, (c, h, wh) in [
    ("flagship quad (3,1024,1024)", (3, 1024, 1024)),
    ("big strip (3,4096,8192)", (3, 4096, 8192)),
]:
    planes = tuple(
        jax.device_put(
            rng.integers(-18000, 18000, (c, h, wh)).astype(np.int16)
        )
        for _ in range(4)
    )

    def run(x, aux, tree):
        os.environ["VKRESAMPLE_CAS_TREE"] = tree
        try:
            return cas_parity4_planes_u2(x, *aux, 0.2)
        finally:
            os.environ.pop("VKRESAMPLE_CAS_TREE", None)

    # correctness: bit-exact on-chip
    os.environ["VKRESAMPLE_CAS_TREE"] = "i16"
    got = [np.asarray(p) for p in jax.jit(
        functools.partial(cas_parity4_planes_u2, sharpen=0.2)
    )(*planes)]
    os.environ.pop("VKRESAMPLE_CAS_TREE", None)
    base = [np.asarray(p) for p in jax.jit(
        functools.partial(cas_parity4_planes_u2, sharpen=0.2)
    )(*planes)]
    md = max(
        np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
        for a, b in zip(got, base)
    )
    print(f"{name}: i16-vs-f32 maxdiff {md}", flush=True)

    for tree in ("f32", "i16"):
        ms = time_device(
            functools.partial(run, tree=tree),
            planes[0], aux=planes[1:], k1=6, k2=30,
        )
        print(f"{name} tree={tree:4s} {ms:8.3f} ms", flush=True)
