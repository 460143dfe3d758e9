"""Stage-by-stage ablation timing of the flagship pipeline on the device.

Each variant is a cumulative prefix of the pipeline, timed with the
fori_loop + forced-readback harness (bench_util).  Differences between
consecutive rows attribute time to stages.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft.mixed_radix import fft
from vkresample_tpu.fft.rfft2 import irfft2_phases, rfft2_packed
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import make_looped


def time_variant(name, fn, x, k1=3, k2=12):
    def wrapped(xx):
        out = fn(xx)
        # normalize to a (..., >=1, >=1) array for the carry probe
        return out.reshape((-1,) + out.shape[-2:]) if out.ndim > 2 else out

    def run(xx, k):
        def body(i, carry):
            xi = xx.at[0, 0, 0].set(carry.astype(xx.dtype))
            out = wrapped(xi)
            return out[0, 0, 0].astype(jnp.float32)

        c = jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return c

    runj = jax.jit(run)
    t_compile = time.perf_counter()
    float(runj(x, k1))
    t_compile = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    float(runj(x, k1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(runj(x, k2))
    t2 = time.perf_counter() - t0
    ms = max(t2 - t1, 1e-9) * 1000.0 / (k2 - k1)
    print(f"{name:34s} {ms:9.3f} ms/iter   (compile {t_compile:.0f}s)", flush=True)
    return ms


def main():
    h, w, u = 1024, 2048, 2
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, sharpen=0.2
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    x = jax.device_put(img, jax.devices()[0])

    dt = jnp.float32

    def norm(xx):
        v = cas_ops.normalize_u8(xx, dt)
        return jnp.moveaxis(v, -1, 0)

    time_variant("normalize+planar (u8->f32)", lambda xx: norm(xx), x)

    def xpass(xx):
        v = norm(xx)
        zr, zi = v[:, 0::2, :], v[:, 1::2, :]
        fr, fi = fft((zr, zi), axis=-1)
        return fr + fi

    time_variant("+ x-FFT (packed rows, w=2048)", xpass, x)

    def fwd(xx):
        fr, fi = rfft2_packed(norm(xx))
        return fr + fi

    time_variant("+ unpack + y-FFT (full fwd)", fwd, x)

    def inv(xx):
        F = rfft2_packed(norm(xx))
        return irfft2_phases(F, h, w, u, keep_nyquist=False)

    time_variant("+ phase inverse (pre-CAS)", inv, x)

    def full_nocas(xx):
        out = inv(xx)
        return cas_ops.quantize_u8(out)

    time_variant("+ quantize (no CAS)", full_nocas, x)

    def full(xx):
        out = inv(xx)
        out = cas_ops.cas_sharpen(out, 0.2)
        out = cas_ops.quantize_u8(out)
        return jnp.moveaxis(out, 0, -1)

    time_variant("FULL (with CAS + layout)", full, x)

    # XLA-tier comparison: jnp.fft based
    from vkresample_tpu.pipeline.upscale import _upscale_core_xla

    def xla_full(xx):
        out = _upscale_core_xla(norm(xx), plan)
        return cas_ops.quantize_u8(out)

    time_variant("XLA tier (jnp.fft) full", xla_full, x)


if __name__ == "__main__":
    main()
