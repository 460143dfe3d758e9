"""Same-process A/B: full flagship pipeline, old quad formulation (f32
planes + aug concat, store16 after) vs new (i16feed staging inside
r2c_quad).  Cross-process numbers on this host swing far more than the
documented ±20%, so this is the decision-grade e2e comparison.
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
from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
engine = plan.resolve_engine()
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def old_quad_pipeline(xx, bb):
    """Round-2 official formulation (1.45 ms): f32 planes, aug concat,
    i16 store applied after the transform."""
    xr = jnp.moveaxis(xx, -1, -3)
    bank_dt = bb["alpha_odd_hi"].dtype
    xb = xr.astype(bank_dt)
    acc = jnp.float32
    a_cat = jnp.concatenate([bb["alpha_odd_hi"], bb["alpha_odd_lo"]], axis=0)
    x_cat = jnp.concatenate([xb, xb], axis=-1)
    P01 = jnp.einsum("...hk,kn->...hn", x_cat, a_cat, preferred_element_type=acc)
    xf = xr.astype(acc)
    signs = jnp.asarray((-1.0) ** np.arange(w), acc)
    q = jnp.sum(xf * signs, axis=-1, keepdims=True)
    P00 = xf * (1.0 / 255.0) - (signs * q) * (1.0 / (255.0 * w))
    t2e = t2o = None
    if "Y1n" in bb:
        tcorr = jnp.einsum("...hw,hr->...rw", xf, bb["Y1n"], precision=HIGH)
        t2 = jnp.einsum("...rw,wn->...rn", tcorr, bb["beta"], precision=HIGH)
        t2e, t2o = t2[..., 0::2], t2[..., 1::2]
    P00aug = P00 if t2e is None else jnp.concatenate([P00, t2e], axis=-2)
    P01aug = P01 if t2o is None else jnp.concatenate([P01, t2o], axis=-2)
    P10 = jnp.einsum("jm,...jn->...mn", bb["Ymat_ns"], P00aug, precision=HIGH)
    P11 = jnp.einsum("jm,...jn->...mn", bb["Ymat_ns"], P01aug, precision=HIGH)
    Ps = [cas_ops.to_i16_storage(p) for p in (P00, P01, P10, P11)]
    return cas_parity4_planes_u2(*Ps, plan.sharpen)


new_pipeline = functools.partial(
    _pipeline, plan=plan, engine=engine, planar_out=True, planes_out=True
)

# correctness cross-check first
o_old = jax.jit(old_quad_pipeline)(x, banks)
o_new = jax.jit(new_pipeline)(x, banks)
md = max(
    int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
    for a, b in zip(o_old, o_new)
)
print(f"old-vs-new u8 maxdiff: {md}", flush=True)

for name, fn in [("old (f32+concat)", old_quad_pipeline), ("new (i16feed)", new_pipeline)]:
    ms = time_device(fn, x, aux=banks, k1=8, k2=40)
    print(f"{name:18s} {ms:7.3f} ms", flush=True)
# repeat to expose within-process drift
for name, fn in [("old again", old_quad_pipeline), ("new again", new_pipeline)]:
    ms = time_device(fn, x, aux=banks, k1=8, k2=40)
    print(f"{name:18s} {ms:7.3f} ms", flush=True)
