"""Interleaved same-process A/B: i16 inter-stage spectral intermediates
vs the default f32, RE-MEASURED at the round-4/5 fused-epilogue
lane-exact layout (VERDICT r4 ask #1 — the round-3 rejection was
measured on a composition that no longer exists).

Variants: f32 baseline, i16 on both inter-stage boundaries, i16 on
S1->S2 only ("s0"), i16 on S2->S3 only ("s1") — the per-boundary split
attributes any win/loss to a specific buffer.  THREE alternating passes
(pass 1 is warm-up; pass 2+ deltas decide — the device speeds up within
a process, so sequential orderings lie).  Correctness: per-variant max
deviation vs the f32 planes in Q2.14 units (1 u8 LSB ~ 64 units); the
shipping gate stays the CLI -validate fp64 oracle.
"""
import functools
import os
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
from vkresample_tpu.pipeline.upscale import _pipeline, make_device_banks

codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
h, w, c = 4096, 8192, 3
plan = UpscalePlan(
    h=h, w=w, upscale=2.0, precision=Precision.HALF,
    engine=Engine.AUTO, channels=c,
)
banks = make_device_banks(plan, Engine.MXU)
img = np.random.default_rng(0).integers(0, 256, (h, w, c), np.uint8)
x = jax.device_put(img)

pipe = functools.partial(
    _pipeline, plan=plan, engine=Engine.MXU, planes_out=True
)

VARIANTS = [
    ("f32 mid", {}),
    ("i16 both", {"VKRESAMPLE_STAGED_INTERMEDIATE": "i16"}),
    ("i16 s0", {"VKRESAMPLE_STAGED_INTERMEDIATE": "i16",
                "VKRESAMPLE_I16_STAGES": "0"}),
    ("i16 s1", {"VKRESAMPLE_STAGED_INTERMEDIATE": "i16",
                "VKRESAMPLE_I16_STAGES": "1"}),
]

base_planes = None
for rnd in (1, 2, 3):
    for name, env in VARIANTS:
        for k, v in env.items():
            os.environ[k] = v
        try:
            md = -1
            if rnd == 1:
                # fresh closure per variant: the cpp jit cache would
                # otherwise silently reuse the previous env's program
                got = [
                    np.asarray(p, np.int32)
                    for p in jax.jit(
                        lambda xx, bb: staged.r2c_quad_staged(
                            jnp.moveaxis(xx, -1, 0), bb,
                            staged.staged_precision(), **codec,
                        )
                    )(x, banks)
                ]
                if base_planes is None:
                    base_planes = got
                md = max(
                    np.abs(a - b).max() for a, b in zip(got, base_planes)
                )
                del got
            ms_t = time_device(
                lambda xx, bb: staged.r2c_quad_staged(
                    jnp.moveaxis(xx, -1, 0), bb,
                    staged.staged_precision(), **codec,
                ),
                x, aux=banks, k1=2, k2=8,
            )
            ms_p = time_device(pipe, x, aux=banks, k1=2, k2=8)
            print(
                f"pass{rnd} {name:10s} transform {ms_t:8.3f}"
                f"  pipeline {ms_p:8.3f} ms"
                + (f"  maxdev-vs-f32(Q2.14) {md}" if md >= 0 else ""),
                flush=True,
            )
        except Exception as e:
            print(f"pass{rnd} {name:10s} FAILED: {str(e)[:250]}", flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)
