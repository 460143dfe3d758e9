"""Same-process A/B: staged circulant route vs int8 dense quad at the
big geometry (4096x8192 -> 8192x16384, 2x half), plus the >16K cliff
check (8192x16384 -> 16384x32768, 1 channel) that only the staged tier
can run.

Round-2 record to beat: int8 dense quad 65.3 ms (x 15.2 / y 33.6 /
CAS 15.4); phases route 189 ms; XLA tier 216 ms.  VERDICT round-2 target:
<= 35 ms e2e with maxdiff <= 1.
"""
import functools
import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.io.png import weave4_host
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)
pipe = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
)

# --- staged circulant route (default banks) -----------------------------
os.environ.pop("VKRESAMPLE_BIG", None)
banks = make_device_banks(plan, Engine.MXU)
assert banks is not None and "stx_b1" in banks, "staged banks missing"
nbytes = sum(np.asarray(v).nbytes for v in jax.tree.leaves(banks))
print(f"staged bank bytes: {nbytes/1e6:.1f} MB", flush=True)
outs = jax.jit(pipe)(x, banks)
got = weave4_host(*[np.asarray(p) for p in outs])
del outs
want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
print(
    "staged maxdiff vs oracle:",
    np.abs(got.astype(np.int64) - want.astype(np.int64)).max(),
    flush=True,
)
del got, want
ms = time_device(pipe, x, aux=banks, k1=2, k2=8, reps=2)
print(f"{'staged quad planes':26s} {ms:9.3f} ms", flush=True)
del banks

# --- int8 dense quad route (round-2 tier; ~4 min host bank staging) -----
os.environ["VKRESAMPLE_BIG"] = "int8"
try:
    banks = make_device_banks(plan, Engine.MXU)
    assert banks is not None and "xq_d1" in banks, "int8 banks missing"
    ms = time_device(pipe, x, aux=banks, k1=2, k2=8, reps=2)
    print(f"{'dense-int8 quad planes':26s} {ms:9.3f} ms", flush=True)
    del banks
except Exception as e:
    print(f"dense-int8 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
finally:
    os.environ.pop("VKRESAMPLE_BIG", None)
del x

# --- >16K output: the cliff only the staged tier clears ------------------
h2, w2 = 8192, 16384
plan2 = UpscalePlan(
    h=h2, w=w2, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
img2 = np.random.default_rng(1).integers(
    0, 256, size=(h2, w2, 1), dtype=np.uint8
)
x2 = jax.device_put(img2)
pipe2 = functools.partial(
    _pipeline, plan=plan2, engine=Engine.MXU, planes_out=True
)
try:
    banks2 = make_device_banks(plan2, Engine.MXU)
    assert banks2 is not None and "stx_b1" in banks2, "staged banks missing"
    outs = jax.jit(pipe2)(x2, banks2)
    got = weave4_host(*[np.asarray(p) for p in outs])
    del outs
    want = np.moveaxis(oracle.upscale_oracle(img2, plan2), -1, 0)
    print(
        "16K->32K staged maxdiff vs oracle:",
        np.abs(got.astype(np.int64) - want.astype(np.int64)).max(),
        flush=True,
    )
    del got, want
    ms = time_device(pipe2, x2, aux=banks2, k1=2, k2=6, reps=2)
    print(f"{'16K->32K staged planes':26s} {ms:9.3f} ms", flush=True)
except Exception as e:
    print(f"16K->32K FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
