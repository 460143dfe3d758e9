"""Same-process interleaved A/B: quad CAS kernel extremes-tree variants.

- f32 (default): decode every input to clipped f32, tree in f32.
- i32 (round 5, VERDICT r4 item 7): sign-extend the Q2.14 codes to i32,
  tree on NATIVE integer min/max, only c/nsum/window-lengths cross to
  f32.  Selections bit-exact; outputs within 1 u8 LSB (FMA contraction).
- i16 (round 2): 2x-lane cmp+select codes — does NOT lower on v5e
  ("Target does not support this comparison"); probed first and skipped
  if the compile fails.

THREE interleaved passes (pass 1 warms up + compiles; pass 2+ decide —
the device speeds up within a process, so sequential orderings lie).
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
SHAPES = [
    ("flagship quad (3,1024,1024)", (3, 1024, 1024)),
    ("big strip (3,4096,8192)", (3, 4096, 8192)),
]
TREES = ["f32", "i32", "i16"]


def run(x, aux, tree):
    os.environ["VKRESAMPLE_CAS_TREE"] = tree
    try:
        return cas_parity4_planes_u2(x, *aux, 0.2)
    finally:
        os.environ.pop("VKRESAMPLE_CAS_TREE", None)


data = {}
for name, (c, h, wh) in SHAPES:
    data[name] = tuple(
        jax.device_put(
            rng.integers(-18000, 18000, (c, h, wh)).astype(np.int16)
        )
        for _ in range(4)
    )

# correctness once, at the small shape: each tree vs f32
name, planes = SHAPES[0][0], data[SHAPES[0][0]]
base = None
for tree in TREES:
    try:
        got = [
            np.asarray(p)
            for p in jax.jit(functools.partial(run, tree=tree))(
                planes[0], planes[1:]
            )
        ]
    except Exception as e:
        print(f"{name} tree={tree}: COMPILE FAILED: {str(e)[:160]}",
              flush=True)
        TREES = [t for t in TREES if t != tree]
        continue
    if base is None:
        base = got
    md = max(
        np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
        for a, b in zip(got, base)
    )
    print(f"{name} tree={tree}: maxdiff-vs-f32 {md}", flush=True)

for rnd in (1, 2, 3):
    for name, _ in SHAPES:
        planes = data[name]
        for tree in TREES:
            ms = time_device(
                functools.partial(run, tree=tree),
                planes[0], aux=planes[1:], k1=6, k2=30,
            )
            print(
                f"pass{rnd} {name} tree={tree:4s} {ms:8.3f} ms", flush=True
            )
