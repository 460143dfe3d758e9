"""Same-process A/B of y-conv formulations at (3, 4096, 8192) i16 input.

Variants:
  base      — current conv_apply_rows einsum order (j major in S1 out)
  adj       — (j, t1) adjacent for S2's contraction; batch k2 leading
  batch6    — both plane pairs in ONE call (channel-stacked)
  bf16mid   — adj with bf16 stage intermediates (accuracy measured vs base)
"""
import functools
import sys

import jax
import numpy as np
from jax import numpy as jnp

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH

h, w = 4096, 8192
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.AUTO
)
banks = jax.device_put(
    {k: jnp.asarray(v) for k, v in staged.r2c_quad_staged_banks(plan).items()}
)
rng = np.random.default_rng(0)
P = jax.device_put(
    rng.integers(-16000, 16000, (3, h, w)).astype(np.int16)
)
P2 = jax.device_put(
    rng.integers(-16000, 16000, (6, h, w)).astype(np.int16)
)


def _pre(x):
    return cas_ops.from_i16_storage(x)


def base(x, bb):
    return cas_ops.to_i16_storage(
        staged.conv_apply_rows(_pre(x), bb, "sty_", HIGH)
    )


def _adj_impl(x, bb, mid=None):
    b1, mb, b3 = bb["sty_b1"], bb["sty_m"], bb["sty_b3"]
    n2, n1 = mb.shape[0], mb.shape[2]
    L = x.shape[-1]
    lead = x.shape[:-2]
    x = x.reshape(lead + (n2, n1, L))
    y = jnp.einsum("ajc,...abL->...cjbL", b1, x, precision=HIGH)
    if mid is not None:
        y = y.astype(mid)
    y = jnp.einsum("cjbkd,...cjbL->...ckdL", mb, y, precision=HIGH)
    if mid is not None:
        y = y.astype(mid)
    y = jnp.einsum("kce,...ckdL->...edL", b3, y, precision=HIGH)
    return y.reshape(lead + (n2 * n1, L))


def adj(x, bb):
    return cas_ops.to_i16_storage(_adj_impl(_pre(x), bb))


def bf16mid(x, bb):
    return cas_ops.to_i16_storage(_adj_impl(_pre(x), bb, mid=jnp.bfloat16))


variants = [("base x2-call", base), ("adj x2-call", adj)]

# correctness: adj / bf16mid vs base (i16 output ticks)
outb = np.asarray(jax.jit(base)(P, banks), np.int32)
for nm, fn in [("adj", adj), ("bf16mid", bf16mid)]:
    o = np.asarray(jax.jit(fn)(P, banks), np.int32)
    d = np.abs(o - outb)
    print(f"{nm} vs base: max tick diff {d.max()} "
          f"({d.max()/16384*255:.3f} u8 LSB)", flush=True)

for name, fn in variants + [("bf16mid x2", bf16mid)]:
    def two(x, bb, f=fn):
        return f(x, bb), f(jnp.flip(x, axis=-1), bb)

    ms = time_device(two, P, aux=banks, k1=3, k2=12)
    print(f"{name:14s} (both planes) {ms:8.3f} ms", flush=True)

# batched-6: one call, channel-stacked planes
for name, fn in [("base batch6", base), ("adj batch6", adj)]:
    ms = time_device(fn, P2, aux=banks, k1=3, k2=12)
    print(f"{name:14s} (both planes) {ms:8.3f} ms", flush=True)
