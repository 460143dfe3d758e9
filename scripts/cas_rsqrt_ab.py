"""Same-process A/B: _cas_core transcendental reduction in the quad kernel.

The CAS stage is VPU-compute-bound (~75 MB of traffic would be ~0.09 ms;
measured ~0.5-0.75 ms).  _cas_core spends a divide + sqrt on the scale:
    sc = -s * sqrt(num/den)
which equals
    sc = -s * num * rsqrt(num*den)        (num, den >= 0)
saving the divide (rsqrt is a native VPU op; divide is reciprocal+Newton).
Guard num*den with a tiny floor so num==0 gives 0, not 0*inf=NaN.

Variants are monkeypatched into ops.cas_pallas before each jit build and
verified for exact uint8 equality (<=1 LSB tolerated) against baseline.
Also sweeps quad_block band heights.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.ops import cas_pallas
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


@jax.jit
def make_planes(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    Ps = dense.r2c_quad(xr, bb, HIGH)
    return tuple(cas_ops.to_i16_storage(p) for p in Ps)


Ps = jax.block_until_ready(make_planes(x, banks))
print("planes", [p.shape for p in Ps], Ps[0].dtype, flush=True)

_orig_core = cas_pallas._cas_core


def _core_rsqrt(c, n, s, xmin, xmax, wpe, cmin, cmax, sharpen):
    min_cross = jnp.minimum(jnp.minimum(n, s), jnp.minimum(c, xmin))
    max_cross = jnp.maximum(jnp.maximum(n, s), jnp.maximum(c, xmax))
    min_all = jnp.minimum(min_cross, cmin)
    max_all = jnp.maximum(max_cross, cmax)
    minlen = 0.5 * (min_cross + min_all)
    maxlen = 0.5 * (max_cross + max_all)
    one = jnp.float32(1.0)
    a, b = minlen, one - minlen
    cq, d = one - maxlen, maxlen
    pred = a * d < cq * b
    num = jnp.where(pred, a, cq)
    den = jnp.where(pred, b, d)
    sc = (-jnp.float32(sharpen)) * num * jax.lax.rsqrt(
        jnp.maximum(num * den, jnp.float32(1e-30))
    )
    out = (c + sc * (n + s + wpe)) / (one + 4.0 * sc)
    return jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _core_rsqrt_recip(c, n, s, xmin, xmax, wpe, cmin, cmax, sharpen):
    min_cross = jnp.minimum(jnp.minimum(n, s), jnp.minimum(c, xmin))
    max_cross = jnp.maximum(jnp.maximum(n, s), jnp.maximum(c, xmax))
    min_all = jnp.minimum(min_cross, cmin)
    max_all = jnp.maximum(max_cross, cmax)
    minlen = 0.5 * (min_cross + min_all)
    maxlen = 0.5 * (max_cross + max_all)
    one = jnp.float32(1.0)
    a, b = minlen, one - minlen
    cq, d = one - maxlen, maxlen
    pred = a * d < cq * b
    num = jnp.where(pred, a, cq)
    den = jnp.where(pred, b, d)
    sc = (-jnp.float32(sharpen)) * num * jax.lax.rsqrt(
        jnp.maximum(num * den, jnp.float32(1e-30))
    )
    out = (c + sc * (n + s + wpe)) * jax.lax.reciprocal(one + 4.0 * sc)
    return jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def run(core, br):
    cas_pallas._cas_core = core

    def fn(p0, aux):
        p1, p2, p3 = aux
        return cas_pallas.cas_parity4_planes_u2(p0, p1, p2, p3, 0.2, block_rows=br)

    outs = jax.jit(fn)(Ps[0], Ps[1:])
    ms = time_device(fn, Ps[0], aux=Ps[1:], k1=4, k2=24)
    cas_pallas._cas_core = _orig_core
    return outs, ms


base_outs, base_ms = run(_orig_core, None)
print(f"baseline (quad_block default)      {base_ms:7.3f} ms", flush=True)

for name, core, br in [
    ("rsqrt br=default", _core_rsqrt, None),
    ("rsqrt+recip br=default", _core_rsqrt_recip, None),
    ("rsqrt br=32", _core_rsqrt, 32),
    ("rsqrt br=128", _core_rsqrt, 128),
    ("orig br=128", _orig_core, 128),
]:
    try:
        outs, ms = run(core, br)
        md = max(
            int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
            for a, b in zip(outs, base_outs)
        )
        print(f"{name:28s} {ms:7.3f} ms   maxdiff {md}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
