"""Batched-mode throughput benchmark (frames/s), single chip.

The reference's batched mode has no published number (README.md:56 gives
only the command line); this measures our frames/s at several batch sizes
with the same device-side chained-loop methodology as bench.py.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.pipeline.bench_util import time_device
from vkresample_tpu.pipeline.upscale import (
    _pipeline,
    make_device_banks,
    parity_planes_supported,
)


def main():
    h, w = 1024, 2048
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    engine = plan.resolve_engine()
    banks = make_device_banks(plan, engine)
    # parity planes out, like bench.py and the CLI: the device-side woven
    # u8 output needs a lane-interleave relayout that costs ~10x the whole
    # pipeline on TPU — the PNG encoder weaves for free instead
    single = functools.partial(
        _pipeline, plan=plan, engine=engine, planar_out=True,
        planes_out=parity_planes_supported(plan),
    )

    rng = np.random.default_rng(0)
    for batch in (1, 2, 4):
        imgs = rng.integers(0, 256, size=(batch, h, w, 3), dtype=np.uint8)
        x = jax.device_put(imgs)

        def step(xx, bb):
            # batch-dependent reduce so no frame can be dead-code
            # eliminated when the probe reads only element [0, ...]
            # (advisor round-2 finding: pure-XLA pipelines without the
            # Pallas CAS custom call are DCE-prone)
            out = single(xx, bb)
            return jax.tree.map(
                lambda p: jnp.max(p, axis=0, keepdims=True), out
            )

        ms = time_device(step, x, aux=banks, k1=3, k2=12, reps=2)
        print(
            f"batch={batch}: {ms:8.3f} ms/step -> {1000.0 * batch / ms:7.1f} frames/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
