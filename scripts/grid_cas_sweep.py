"""Round-4 grid-CAS (bt, wsb) sweep at the big u=3 geometry — one
process, interleaved passes, min-over-pass2+.

The grid kernel's default band height is the heuristic
quad_block*4/u^2 (= 16 at u=3, i16), but the calibrated VMEM estimate
(_grid_geometry) says bt=32/wsb=1024 fits the 14 MB budget with room —
and the round-4 grid profile shows the CAS at 9.4 of 17.1 ms (55% of
the u=3 pipeline, 3.6x its VPU floor).  All slots geometries are
bit-identical; asserted vs the default.
"""
import functools
import os
import sys
import time as _time

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.ops.cas_pallas import cas_parity_grid_planes
from vkresample_tpu.pipeline.bench_util import make_looped

rng = np.random.default_rng(0)
u = 3
c, h, wp = 3, 2048, 4096
planes = tuple(
    jax.device_put(rng.integers(-18000, 18000, (c, h, wp)).astype(np.int16))
    for _ in range(u * u)
)

GEOMS = [
    ("bt16 wsb1024 (default)", 0, 0),
    ("bt32 wsb1024", 32, 1024),
    ("bt16 wsb512 ", 16, 512),
    ("bt32 wsb512 ", 32, 512),
    ("bt48 wsb512 ", 48, 512),
    ("bt16 wsb2048", 16, 2048),
    ("bt32 wsb256 ", 32, 256),
    ("bt64 wsb256 ", 64, 256),
]

base = None
ARMS = []
for name, bt, wsb in GEOMS:
    os.environ["VKRESAMPLE_GRID_BT"] = str(bt)
    os.environ["VKRESAMPLE_GRID_WSB"] = str(wsb)

    def mk():
        def run(x, aux):
            return cas_parity_grid_planes((x,) + aux, u, 0.2)

        return run

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
os.environ["VKRESAMPLE_GRID_BT"] = "0"
os.environ["VKRESAMPLE_GRID_WSB"] = "0"

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
