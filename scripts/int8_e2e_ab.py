"""Same-process e2e A/B + oracle check: int8 quad route vs bf16/HIGH.

The route is decided from bank content (advisor round-2 fix), so the
bf16/HIGH arm passes a bank dict with the xq*/yq* digit banks stripped.
Oracle maxdiff is checked at the flagship shape for both.
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
engine = plan.resolve_engine()
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)

pipe = functools.partial(
    _pipeline, plan=plan, engine=engine, planar_out=True, planes_out=True
)

want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)


def weave(outs):
    got = np.zeros((3, 2 * h, 2 * w), np.uint8)
    got[:, 0::2, 0::2] = np.asarray(outs[0])
    got[:, 0::2, 1::2] = np.asarray(outs[1])
    got[:, 1::2, 0::2] = np.asarray(outs[2])
    got[:, 1::2, 1::2] = np.asarray(outs[3])
    return got


banks_off = {
    k: v for k, v in banks.items() if not k.startswith(("xq", "yq"))
}
results = {}
for name, bb in [("bf16/HIGH", banks_off), ("int8", banks)]:
    fn = functools.partial(pipe)
    outs = jax.jit(fn)(x, bb)
    md = int(np.abs(weave(outs).astype(int) - want.astype(int)).max())
    ms = time_device(fn, x, aux=bb, k1=8, k2=40)
    print(f"{name:10s} {ms:7.3f} ms   oracle maxdiff {md}", flush=True)
