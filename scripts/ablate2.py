"""Second ablation: where does the interleaved-path time go?"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops import cas as cas_ops
from vkresample_tpu.pipeline.bench_util import time_device


def main():
    h, w = 1024, 2048
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, sharpen=0.2,
        engine=Engine.MXU,
    )
    banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
    prec = plan.precision.matmul_precision
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    x = jax.device_put(img)

    def norm(xx):
        return jnp.moveaxis(cas_ops.normalize_u8(xx, jnp.float32), -1, 0)

    def matmuls_only(xx, aux):
        v = dense.r2c_interleaved(norm(xx), aux, 2, prec)
        return (v[..., :8, :8] * 255).astype(jnp.int32).astype(jnp.uint8)

    def no_cas(xx, aux):
        v = dense.r2c_interleaved(norm(xx), aux, 2, prec)
        return cas_ops.quantize_u8(v)

    def pallas_cas(xx, aux):
        from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas

        v = dense.r2c_interleaved(norm(xx), aux, 2, prec)
        return cas_quantize_pallas(v, 0.2)

    def xla_cas(xx, aux):
        v = dense.r2c_interleaved(norm(xx), aux, 2, prec)
        return cas_ops.quantize_u8(cas_ops.cas_sharpen(v, 0.2))

    for name, fn in [
        ("matmuls+weaves only (tiny out)", matmuls_only),
        ("+ quantize full (no CAS)", no_cas),
        ("+ pallas CAS", pallas_cas),
        ("+ XLA CAS", xla_cas),
    ]:
        ms = time_device(fn, x, aux=banks, k1=4, k2=24)
        print(f"{name:34s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
