"""Same-process A/B: transform-stage (uint8 -> 4 i16 parity planes)
formulations.

bench --stages puts the y stage at ~0.62 ms while the isolated y matmul
(scripts/ymm_ab.py) runs 0.22 ms: the gap is pipeline overhead — the
`aug` concats (P00/P01 + correction rows) copy full 25 MB planes just to
add r=1 correction rows to the contraction.  Variant `split` removes the
concats: contract the main (h) rows and add the rank-r correction as a
separate tiny einsum fused into the epilogue.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import make_device_banks

HIGH = jax.lax.Precision.HIGH
h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def quad_current(xx, bb):
    xr = jnp.moveaxis(xx, -1, 0)
    Ps = dense.r2c_quad(xr, bb, HIGH)
    return tuple(cas_ops.to_i16_storage(p) for p in Ps)


def _head(xx, bb):
    """P00, P01 and the correction rows, shared by the split variants."""
    xr = jnp.moveaxis(xx, -1, 0)
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
    return P00, P01, t2e, t2o


def quad_split(xx, bb):
    """No aug-concat: main-row y matmul + rank-r correction einsum."""
    P00, P01, t2e, t2o = _head(xx, bb)
    Y = bb["Ymat_ns"]
    Ym, Yc = Y[:h], Y[h:]
    P10 = jnp.einsum("jm,cjn->cmn", Ym, P00, precision=HIGH)
    P11 = jnp.einsum("jm,cjn->cmn", Ym, P01, precision=HIGH)
    if t2e is not None:
        P10 = P10 + jnp.einsum("rm,crn->cmn", Yc, t2e, precision=HIGH)
        P11 = P11 + jnp.einsum("rm,crn->cmn", Yc, t2o, precision=HIGH)
    return tuple(cas_ops.to_i16_storage(p) for p in (P00, P01, P10, P11))


def quad_split_bf16p(xx, bb):
    """split + explicitly pre-cast the y activations to bf16 once (XLA's
    HIGH decomposition re-derives hi/lo per pass; P00/P01 feed two
    consumers — the i16 store and the matmul — which can force an f32
    materialization)."""
    P00, P01, t2e, t2o = _head(xx, bb)
    Y = bb["Ymat_ns"]
    Ym, Yc = Y[:h], Y[h:]
    P10 = jnp.einsum("jm,cjn->cmn", Ym, P00, precision=HIGH)
    P11 = jnp.einsum("jm,cjn->cmn", Ym, P01, precision=HIGH)
    if t2e is not None:
        corr10 = Yc[0][None, :, None] * t2e[:, 0][:, None, :]
        corr11 = Yc[0][None, :, None] * t2o[:, 0][:, None, :]
        P10 = P10 + corr10
        P11 = P11 + corr11
    return tuple(cas_ops.to_i16_storage(p) for p in (P00, P01, P10, P11))


VARIANTS = [
    ("current (aug concat)", quad_current),
    ("split (rank-r einsum)", quad_split),
    ("split (bcast corr)", quad_split_bf16p),
]

base = None
for name, fn in VARIANTS:
    try:
        outs = jax.jit(fn)(x, banks)
        if base is None:
            base = outs
            md = 0
        else:
            md = max(
                int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
                for a, b in zip(outs, base)
            )
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:24s} {ms:7.3f} ms   maxdiff(i16) {md}", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
