"""One-process sweep of output-path variants for the flagship config."""
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
from vkresample_tpu.ops.cas_pallas import cas_quantize_pallas, cas_quantize_rows_u
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
DEF = jax.lax.Precision.DEFAULT


def main():
    h, w, u = 1024, 2048, 2
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
    # f32 alpha variant for comparison
    import numpy as _np

    b64 = dense.r2c_rows_banks(plan, "float32")
    alpha_f32 = jax.device_put(
        (b64["alpha_hi"].astype(_np.float32) + b64["alpha_lo"].astype(_np.float32))
    )
    banks_f32 = dict(banks)
    banks_f32["alpha_f32"] = alpha_f32

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    x = jax.device_put(img)

    def rows_split(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0)
        return dense.r2c_rows(xr, bb, HIGH)

    def rows_f32(xx, bb):
        xr = jnp.moveaxis(xx, -1, 0).astype(jnp.float32)
        U = jnp.einsum(
            "...hw,wn->...hn", xr, bb["alpha_f32"], precision=HIGH
        )
        tc = jnp.einsum("...hw,hr->...rw", xr, bb["Y1n"], precision=HIGH)
        t2 = jnp.einsum("...rw,wn->...rn", tc, bb["beta"], precision=HIGH)
        O = jnp.einsum(
            "jm,...jn->...mn",
            bb["Ymat_ns"],
            jnp.concatenate([U, t2], -2),
            precision=HIGH,
        )
        return U, O

    def v_fused(rows_fn, bb):
        def f(xx, _b):
            U, O = rows_fn(xx, _b)
            return cas_quantize_rows_u(U, O, 2, 0.2)

        return f, bb

    def v_weave(rows_fn, bb):
        def f(xx, _b):
            U, O = rows_fn(xx, _b)
            v = dense.weave_rows(U, O, 2)
            return cas_quantize_pallas(v, 0.2)

        return f, bb

    variants = [
        ("split-x + fused kernel", *v_fused(rows_split, banks)),
        ("split-x + weave + plain kernel", *v_weave(rows_split, banks)),
        ("f32-x HIGH + fused kernel", *v_fused(rows_f32, banks_f32)),
        ("f32-x HIGH + weave + plain", *v_weave(rows_f32, banks_f32)),
    ]
    for name, fn, bb in variants:
        ms = time_device(fn, x, aux=bb, k1=4, k2=24)
        print(f"{name:34s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
