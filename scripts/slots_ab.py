"""Same-process A/B: slot-resident strip CAS vs the aligned-halo strip
kernel at the big-tier geometry (planes (3, 4096, 8192) i16 = 8K->16K).

The halo kernel DMAs (bt + 2*pad) rows per band because DMA slices need
pad-row alignment (pad=16 at i16) — amplification 1.25x at bt=128.  The
slots kernel DMAs exactly bt rows and reads the 1-row halos from the
vertical neighbors' still-resident slots: amplification (bt+2)/bt, and
bt is no longer pinned to the alignment grid, so smaller bands (deeper
pipelining, less VMEM per slot → wider strips) come back into play.
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
    ("halo  bt128 wsb1024", {"VKRESAMPLE_QUAD_STRIP": "halo"}),
    ("slots bt128 wsb1024 (default)", {}),
    ("slots bt64  wsb1024", {"VKRESAMPLE_QUAD_STRIP": "slots",
                             "VKRESAMPLE_QUAD_BT": "64"}),
    ("slots bt64  wsb2048", {"VKRESAMPLE_QUAD_STRIP": "slots",
                             "VKRESAMPLE_QUAD_BT": "64",
                             "VKRESAMPLE_QUAD_WSB": "2048"}),
    ("slots bt128 wsb2048", {"VKRESAMPLE_QUAD_STRIP": "slots",
                             "VKRESAMPLE_QUAD_BT": "128",
                             "VKRESAMPLE_QUAD_WSB": "2048"}),
    ("slots bt32  wsb2048", {"VKRESAMPLE_QUAD_STRIP": "slots",
                             "VKRESAMPLE_QUAD_BT": "32",
                             "VKRESAMPLE_QUAD_WSB": "2048"}),
]:
    def run(x, aux):
        return cas_parity4_planes_u2(x, *aux, 0.2)

    for k, v in env.items():
        os.environ[k] = v
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
            np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
            for a, b in zip(got, base)
        )
        ms = time_device(run, planes[0], aux=planes[1:], k1=4, k2=16)
        print(f"{name:30s} {ms:9.3f} ms  maxdiff-vs-default {md}", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
