"""Headline benchmark: 2048x1024 -> 4096x2048 2x FFT upscale + CAS sharpen.

Reference baseline: < 2 ms/frame on a GTX 1660 Ti (README.md:12), measured
as chrono around one command-buffer submit of `-n` pipeline repeats
(VkResample.cpp:1249-1279).  The TPU measurement reproduces those
semantics with the repeats inside ONE device program (lax.fori_loop with a
chained data dependency) and a forced scalar readback as the fence — see
vkresample_tpu/pipeline/bench_util.py for why host-side dispatch loops are
not trustworthy on tunneled PJRT backends.

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_frame, "unit": "ms", "vs_baseline": x}
vs_baseline = baseline_ms / measured_ms  (>1 means faster than the 2 ms
reference target).
"""
from __future__ import annotations

import functools
import json
import sys


def main() -> int:
    import jax
    import numpy as np

    from vkresample_tpu.core.config import Engine, Precision
    from vkresample_tpu.core.plan import UpscalePlan
    from vkresample_tpu.pipeline.bench_util import time_device
    from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

    h, w, u = 1024, 2048, 2.0
    baseline_ms = 2.0
    k2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    plan = UpscalePlan(
        h=h,
        w=w,
        upscale=u,
        precision=Precision.HALF,  # reference headline is -p 2 (fp16 mode)
        sharpen=0.2,
        engine=Engine.AUTO,
    )
    engine = plan.resolve_engine()
    # planar output: the reference's timed region also ends at planar GPU
    # buffers — host channel-interleave happens after the fence
    # (VkResample.cpp:1697-1754); our PNG encoder consumes planar directly
    pipeline = functools.partial(
        _pipeline, plan=plan, engine=engine, planar_out=True
    )
    banks = make_device_banks(plan, engine)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    x = jax.device_put(img, jax.devices()[0])

    ms = time_device(pipeline, x, aux=banks, k1=max(2, k2 // 5), k2=k2)

    print(
        json.dumps(
            {
                "metric": "upscale_2048x1024_to_4096x2048_fp16_ms_per_frame",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
