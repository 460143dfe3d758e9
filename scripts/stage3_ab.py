"""ONE-process three-way split: transform-only, CAS-only, end-to-end.

Earlier A/Bs measured transform ~0.3 ms and CAS ~0.53 ms in different
processes while e2e lands ~1.2-1.45 — this script measures all three in
the same process to quantify the composition gap (scheduling bubbles,
input moveaxis, plane handoff) before hunting it.
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
CODEC = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)


def transform_only(xx, bb):
    xr = jnp.moveaxis(xx, -1, -3)
    return dense.r2c_quad(xr, bb, HIGH, **CODEC)


def x_stage_only(xx, bb):
    xr = jnp.moveaxis(xx, -1, -3)
    return dense.r2c_quad(xr, bb, HIGH, **CODEC)[:2]


Ps = jax.block_until_ready(jax.jit(transform_only)(x, banks))


def cas_only(p0, aux):
    p1, p2, p3 = aux
    return cas_parity4_planes_u2(p0, p1, p2, p3, plan.sharpen)


e2e = functools.partial(
    _pipeline, plan=plan, engine=engine, planar_out=True, planes_out=True
)

def moveaxis_probe(xx, bb):
    """input-side cost bound: the u8 planar transpose + an elementwise
    i16 store (no matmuls)."""
    xr = jnp.moveaxis(xx, -1, -3)
    return cas_ops.to_i16_storage(xr.astype(jnp.float32) * (1.0 / 255.0))


xp = jax.device_put(np.moveaxis(img, -1, 0).copy())


def x_stage_planar(xx, bb):
    """x stage fed PLANAR uint8 (no device transpose) — what a planar
    host decode would enable."""
    return dense.r2c_quad(xx, bb, HIGH, **CODEC)[:2]


for name, fn, arg, aux in [
    ("moveaxis+store", moveaxis_probe, x, banks),
    ("x stage planar-in", x_stage_planar, xp, banks),
    ("x stage only", x_stage_only, x, banks),
    ("transform (x+y)", transform_only, x, banks),
    ("CAS only", cas_only, Ps[0], Ps[1:]),
    ("end-to-end", e2e, x, banks),
    ("transform again", transform_only, x, banks),
    ("CAS again", cas_only, Ps[0], Ps[1:]),
    ("e2e again", e2e, x, banks),
]:
    ms = time_device(fn, arg, aux=aux, k1=8, k2=40)
    print(f"{name:18s} {ms:7.3f} ms", flush=True)
