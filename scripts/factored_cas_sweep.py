"""Bisect the factored-route regression (gate: 46.8 vs 30.5 ms e2e at 8K)
and sweep the factored CAS band geometry.

Stages, all same-process:
  1. transform-only A/B (production r2c_quad_staged natural vs factored,
     i16 stores included) — confirms probe5 in production form.
  2. CAS-only A/B on prestored i16 planes: natural kernel vs factored
     kernel at several (bt, wsb) geometries (fresh closures per env —
     the jit cache ignores env changes).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops import cas_pallas
from vkresample_tpu.pipeline.bench_util import time_device

h, w = 4096, 8192
SHARPEN = 0.2
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
)
banks = staged.r2c_quad_staged_banks(plan)
banks = {k: jax.device_put(jnp.asarray(v)) for k, v in banks.items()}
n1, n2 = staged.factored_split(banks)
prec = staged.staged_precision()
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (3, h, w), np.uint8)
x = jax.device_put(img)


def tf_nat(xx, bb):
    return staged.r2c_quad_staged(
        xx, bb, prec,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
    )


def tf_fac(xx, bb):
    return staged.r2c_quad_staged(
        xx, bb, prec,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
        factored=True,
    )


# SWEEP_TRANSFORM=0 skips the (already-recorded) transform A/B — the 4
# re-compiles cost minutes of the process budget
if os.environ.get("SWEEP_TRANSFORM", "1") != "0":
    for rnd in (1, 2):
        for name, fn in (("T nat", tf_nat), ("T fac", tf_fac)):
            ms = time_device(fn, x, aux=banks, k1=2, k2=8)
            print(f"pass{rnd} {name} transform {ms:8.3f} ms", flush=True)

# prestored planes for the CAS-only stage
Pn = jax.block_until_ready(jax.jit(tf_nat)(x, banks))
Pf = jax.block_until_ready(jax.jit(tf_fac)(x, banks))
Pn = [jax.device_put(p) for p in Pn]
Pf = [jax.device_put(p) for p in Pf]


def cas_nat_mk():
    # time_device wants an array leading arg: plane 0 rides x, rest aux
    def f(p0, rest):
        return cas_pallas.cas_parity4_planes_u2(p0, *rest, SHARPEN)

    return f


def cas_fac_mk():
    def f(p0, rest):
        return cas_pallas.cas_parity4_planes_u2(
            p0, *rest, SHARPEN, fac_split=(n1, n2)
        )

    return f


GEOMS = [
    ("nat default ", None, None, False),
    ("fac 128/1024", 128, 1024, True),
    ("fac 64/1024 ", 64, 1024, True),
    ("fac 128/2048", 128, 2048, True),
    ("fac 32/2048 ", 32, 2048, True),
]

# compile each geometry ONCE (time_device re-jits per call — 15 Pallas
# compiles would blow the process budget), then interleave timing passes
# over the compiled runners.  Env is read at trace time, so set it
# before the compiling warm call.
import time as _time

from vkresample_tpu.pipeline.bench_util import make_looped


def prep(fn, x0, rest):
    run = make_looped(fn)
    int(run(x0, rest, 2))  # compile + warm under the CURRENT env

    def measure(k):
        t0 = _time.perf_counter()
        int(run(x0, rest, k))
        return _time.perf_counter() - t0

    return measure


runners = []
for name, bt, wsb, fac in GEOMS:
    os.environ["VKRESAMPLE_QUAD_BT"] = str(bt or 0)
    os.environ["VKRESAMPLE_QUAD_WSB"] = str(wsb or 0)
    fn = cas_fac_mk() if fac else cas_nat_mk()
    args = tuple(Pf) if fac else tuple(Pn)
    try:
        runners.append((name, prep(fn, args[0], tuple(args[1:]))))
        print(f"compiled CAS {name}", flush=True)
    except Exception as e:
        print(f"CAS {name} COMPILE FAILED: {str(e)[:160]}", flush=True)
os.environ["VKRESAMPLE_QUAD_BT"] = "0"
os.environ["VKRESAMPLE_QUAD_WSB"] = "0"

quot = {name: [] for name, _ in runners}
for rnd in (1, 2, 3, 4):
    for name, m in runners:
        t1, t2 = m(2), m(8)
        ms = max(t2 - t1, 1e-9) * 1000.0 / 6
        if rnd >= 2:
            quot[name].append((t1, t2))
        print(f"pass{rnd} CAS {name} {ms:8.3f} ms", flush=True)

# decision number: min t1 / min t2 over passes 2+ separately (a tunnel
# stall inflates one sample; mins cancel it — time_device's rationale)
for name, _ in runners:
    if quot[name]:
        t1 = min(t for t, _ in quot[name])
        t2 = min(t for _, t in quot[name])
        ms = max(t2 - t1, 1e-9) * 1000.0 / 6
        print(f"DECIDE CAS {name} {ms:8.3f} ms (min-over-pass2+)", flush=True)

# --- isolate the factored arm's one relayout: the on-device u8 P00
# scramble (scramble_cols of the raw image — P00 covers ALL w columns:
# even OUTPUT cols = every input sample).  If this is ~the 3 ms
# transform regression plus the ~5 ms S3 saving, the conv chain itself
# wins and an ingest-time host-side scramble would flip the route.
xe = jax.device_put(img)


def scr(xx, _aux):
    return staged.scramble_cols(xx, n1, n2)


for rnd in (1, 2):
    ms = time_device(scr, xe, k1=2, k2=8)
    print(f"pass{rnd} P00 u8 scramble {ms:8.3f} ms", flush=True)
