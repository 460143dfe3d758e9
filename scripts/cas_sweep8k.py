"""Round-4 slots-strips CAS (bt, wsb) sweep at the 8K planes geometry
(3, 4096, 8192) i16 — one process, interleaved passes, min-over-pass2+.

The shipped strip default bt=128/wsb=1024 was tuned in the HALO-kernel
era (scripts/big_cas_ab.py: halo amplification drove the choice).  The
slot-resident kernel removed the row-halo tax entirely, which moved the
optimum at the flagship full-width geometry (bt 64 -> 32); this sweep
asks the same question for the strip regime now that CAS is the
dominant pipeline item (8.9 of 25.0 ms at 8K->16K, round-4 profile).
All slots geometries are bit-identical by construction; the sweep
asserts it vs the default.
"""
import functools
import os
import sys
import time as _time

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import make_looped

rng = np.random.default_rng(0)
c, h, wh = 3, 4096, 8192
planes = tuple(
    jax.device_put(rng.integers(-18000, 18000, (c, h, wh)).astype(np.int16))
    for _ in range(4)
)

GEOMS = [
    ("bt128 wsb1024 (default)", 128, 1024),
    ("bt64  wsb1024", 64, 1024),
    ("bt256 wsb1024", 256, 1024),
    ("bt32  wsb1024", 32, 1024),
    ("bt128 wsb2048", 128, 2048),
    ("bt64  wsb2048", 64, 2048),
    ("bt32  wsb2048", 32, 2048),
    ("bt128 wsb512 ", 128, 512),
    ("bt256 wsb512 ", 256, 512),
    ("bt64  wsb4096", 64, 4096),
    ("bt32  wsb4096", 32, 4096),
]

base = None
ARMS = []
for name, bt, wsb in GEOMS:
    os.environ["VKRESAMPLE_QUAD_BT"] = str(bt)
    os.environ["VKRESAMPLE_QUAD_WSB"] = str(wsb)

    def mk():
        def run(x, aux):
            return cas_parity4_planes_u2(x, *aux, 0.2)

        return run

    try:
        got = [
            np.asarray(p)
            for p in jax.jit(
                functools.partial(cas_parity4_planes_u2, sharpen=0.2)
            )(*planes)
        ]
        if base is None:
            base = got
        md = max(
            int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
            for a, b in zip(got, base)
        )
        run = make_looped(mk())
        t0 = _time.perf_counter()
        int(run(planes[0], planes[1:], 2))
        print(
            f"compiled {name} in {_time.perf_counter()-t0:.0f}s"
            f" maxdiff-vs-default {md}",
            flush=True,
        )

        def measure(k, run=run):
            t0 = _time.perf_counter()
            int(run(planes[0], planes[1:], k))
            return _time.perf_counter() - t0

        ARMS.append((name, measure))
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:200]}", flush=True)
os.environ["VKRESAMPLE_QUAD_BT"] = "0"
os.environ["VKRESAMPLE_QUAD_WSB"] = "0"

quot = {name: [] for name, _ in ARMS}
for rnd in (1, 2, 3):
    for name, m in ARMS:
        t1, t2 = m(2), m(8)
        ms = max(t2 - t1, 1e-9) * 1000.0 / 6
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} {name} {ms:8.3f} ms", flush=True)

for name, _ in ARMS:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 6
        print(f"DECIDE {name} {ms:8.3f} ms (min-over-pass2+)", flush=True)
