"""Round-4 16K->32K boundary-relayout probe: (xsplit, ysplit) sweep at
8192x16384 -> 16384x32768 half 3ch, one process, interleaved passes,
min-over-pass2+.

The round-4 big16k HLO attribution found ~7.3 ms of x->y boundary
relayouts the (4x smaller) 8K program does NOT pay pro-rata: TWO
separate f32 dequant materializations (copy.57 (3,8192,128,128) +
reshape.63 (3,128,64,16384), 4.9 ms each) plus an s16 encode layout
copy (copy.42, 2.4 ms).  At w=16384 the x split lands on n1=128,
n2=128 (vs n2=64 at 8K) and the y split on n1=64, n2=128 — this sweep
asks whether the extra relayouts follow the split geometry.

Arms (xsplit base, ysplit): X128/Ydef is the shipped default.
"""
import os
import sys
import time as _time

import jax
import numpy as np

sys.path.insert(0, ".")

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.pipeline.bench_util import make_looped
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 8192, 16384
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, sharpen=0.2,
    engine=Engine.AUTO, channels=3,
)
eng = plan.resolve_engine()
rng = np.random.default_rng(0)
x = jax.device_put(rng.integers(0, 256, (h, w, 3), np.uint8))

# Round 1 of this sweep (pre-auto-rule): X256 108.4 / X128 112.1 /
# X64 117.4 min-over-pass2+; the Y128 arms were cache-duplicates of
# Ydef (VKRESAMPLE_YSPLIT missing from the bankcache key — fixed).
# Round 2 arms: the auto default (X doubles until n2<=64 -> 256 here)
# vs the y-split analog (y n1=128 -> n2=64) vs the old X128 control.
GEOMS = [
    ("Xauto Ydef (default)", "", ""),
    ("Xauto Y128", "", "128"),
    ("X128  Ydef (old)", "128", ""),
]

BANKS = {}
for name, xs, ys in GEOMS:
    os.environ["VKRESAMPLE_XSPLIT"] = xs
    os.environ["VKRESAMPLE_YSPLIT"] = ys
    if xs:
        os.environ["VKRESAMPLE_XSPLIT"] = xs
    else:
        os.environ.pop("VKRESAMPLE_XSPLIT", None)
    if not ys:
        os.environ.pop("VKRESAMPLE_YSPLIT", None)
    t0 = _time.perf_counter()
    BANKS[name] = make_device_banks(plan, eng, planes=True)
    sty = BANKS[name]["sty_m"].shape
    stx = BANKS[name]["stx_m"].shape
    print(
        f"banks {name}: stx m {stx} sty m {sty}"
        f" ({_time.perf_counter()-t0:.0f}s)",
        flush=True,
    )
os.environ.pop("VKRESAMPLE_XSPLIT", None)
os.environ.pop("VKRESAMPLE_YSPLIT", None)


def prep(name):
    bb = BANKS[name]

    def e2e(xx, _):
        return _pipeline(xx, bb, plan=plan, engine=eng, planes_out=True)

    run = make_looped(e2e)
    t0 = _time.perf_counter()
    int(run(x, 0, 1))
    print(f"compiled {name} in {_time.perf_counter() - t0:.0f}s", flush=True)

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x, 0, k))
        return _time.perf_counter() - t0

    return measure, e2e


ARMS = []
REF = {}
for name, xs, ys in GEOMS:
    try:
        m, e2e = prep(name)
        ARMS.append((name, m))
        REF[name] = e2e
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:300]}", flush=True)

# correctness: each arm vs the default, first plane only (bytes are big)
base = np.asarray(
    jax.tree_util.tree_leaves(jax.jit(REF[GEOMS[0][0]])(x, 0))[0], np.int16
)
for name, _, _ in GEOMS[1:]:
    if name not in REF:
        continue
    got = np.asarray(
        jax.tree_util.tree_leaves(jax.jit(REF[name])(x, 0))[0], np.int16
    )
    print(f"maxdiff {name} vs default (P00): {np.abs(got - base).max()}",
          flush=True)
del base, got

quot = {name: [] for name, _ in ARMS}
for rnd in (1, 2, 3):
    for name, m in ARMS:
        t1, t2 = m(1), m(4)
        ms = max(t2 - t1, 1e-9) * 1000.0 / 3
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} {name} {ms:8.3f} ms", flush=True)

for name, _ in ARMS:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 3
        print(f"DECIDE {name} {ms:8.3f} ms (min-over-pass2+)", flush=True)
