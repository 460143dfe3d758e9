"""On-TPU accuracy probe: full pipeline maxdiff vs fp64 oracle per matmul
precision.  (CPU tests can't see bf16 operand rounding — the MXU must run.)"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from vkresample_tpu.core.config import Engine, Precision
    from vkresample_tpu.core.plan import UpscalePlan
    from vkresample_tpu.oracle import numpy_ref as oracle
    from vkresample_tpu.pipeline.upscale import build_upscale

    # natural-image-like test frame
    rng = np.random.default_rng(3)
    h, w = 512, 1024
    yy, xx = np.mgrid[0:h, 0:w]
    base = 127 + 60 * np.sin(2 * np.pi * 5 * xx / w) * np.cos(2 * np.pi * 3 * yy / h)
    img = np.clip(base[..., None] + rng.normal(0, 20, (h, w, 3)), 0, 255).astype(
        np.uint8
    )

    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, sharpen=0.2,
        engine=Engine.MXU,
    )
    want = oracle.upscale_oracle(img, plan)

    import jax.lax

    for name in ["highest", "high", "default"]:
        os.environ["VKRESAMPLE_MM_PRECISION"] = name
        build_upscale.cache_clear()
        fn = build_upscale(plan)
        got = np.asarray(fn(img))
        d = np.abs(got.astype(int) - want.astype(int))
        print(
            f"{name:8s}: maxdiff={d.max()}  mean={d.mean():.2e}  "
            f"frac>1={(d > 1).mean():.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
