"""Headline benchmark: 2048x1024 -> 4096x2048 2x FFT upscale + CAS sharpen.

Reference baseline: < 2 ms/frame on a GTX 1660 Ti (README.md:12), measured
as chrono around one command-buffer submit of `-n` pipeline repeats
(VkResample.cpp:1249-1279).  The TPU measurement reproduces those
semantics with the repeats inside ONE device program (lax.fori_loop with a
chained data dependency) and a forced scalar readback as the fence — see
vkresample_tpu/pipeline/bench_util.py for why host-side dispatch loops are
not trustworthy on tunneled PJRT backends.

Officials protocol (round 5): measurements are thunks run in INTERLEAVED
passes — every tier measured once per pass, in order; the reported value
is the MEDIAN across passes when there are >= 3, else the min.  The
device warms up over a process (whatever runs last looks fastest), so
single-sequential officials under- or over-state tiers by order;
interleaving gives every tier at least one warmed measurement, and the
median additionally rejects the tunnel's rare ack-before-execute
artifacts (a single pass has returned 0.0000 for a tier whose other
passes agreed at 1.5-1.8 ms).  --full runs 3 passes (compiles are cached
after pass 1, so later passes cost only execution); --passes N overrides.

Artifact guard: the ack artifact is always anomalously LOW (observed
0.0000 / 0.33 / 0.71 ms against a 1.23-1.37 flagship band — the tunnel
acks the forced readback before execution), so per tier any reading
under 0.45x that tier's max reading is discarded before the median, and
if a tier lacks 3 plausible readings agreeing within +-30% of their
median, up to 2 extra full interleaved passes run — execution-only
cost, everything is compiled by then.  A bad host regime can therefore
cost minutes, never a garbage committed number; tiers still unstable
after the extra passes are reported with an "unstable_" key prefix so a
recorded official can never silently carry a reading the process could
not reproduce.

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_frame, "unit": "ms", "vs_baseline": x}
vs_baseline = baseline_ms / measured_ms  (>1 means faster than the 2 ms
reference target).
"""
from __future__ import annotations

import functools
import json
import statistics
import sys

# Artifact guard thresholds (module-level so tests can pin the policy).
# The tunnel's ack-before-execute artifact is always anomalously LOW
# (observed 0.0 / 0.33 / 0.71 ms against a 1.23-1.37 true band), so a
# reading under ARTIFACT_FRACTION x the tier's max reading is discarded.
# A tier is stable once >= 3 plausible readings agree within AGREE_BAND
# of their median (a lone pass-1 warmup outlier therefore cannot flag a
# tier whose later passes agree); otherwise up to EXTRA_PASSES more
# interleaved passes run.
ARTIFACT_FRACTION = 0.45
AGREE_BAND = 0.3
EXTRA_PASSES = 2


def _plausible(vs: list) -> list:
    """Readings that are not ack-before-execute artifacts (low outliers)."""
    vmax = max(vs)
    return [v for v in vs if v >= ARTIFACT_FRACTION * vmax]


def _unstable(vs: list) -> bool:
    """True when the tier needs more passes (or a caveat): artifacts or
    outliers left fewer than 3 readings (or all of them, for short
    runs) agreeing within AGREE_BAND of the plausible median."""
    keep = _plausible(vs)
    if not keep or min(keep) <= 0:
        return True
    m = statistics.median(keep)
    agree = sum(1 for v in keep if abs(v - m) <= AGREE_BAND * m)
    return agree < min(3, len(vs))


def _robust_value(vs: list) -> float:
    """Median of the plausible readings (min when fewer than 3 survive)."""
    keep = _plausible(vs)
    return statistics.median(keep) if len(keep) >= 3 else min(keep)


def main() -> int:
    import jax
    import numpy as np

    from vkresample_tpu.core.bankcache import enable_compilation_cache

    # timing is device-side execution only (compiles happen before the
    # timed region), so the persistent executable cache changes wall-
    # clock, never the measurement
    enable_compilation_cache()

    from vkresample_tpu.core.config import Engine, Precision
    from vkresample_tpu.core.plan import UpscalePlan
    from vkresample_tpu.pipeline.bench_util import time_device
    from vkresample_tpu.pipeline.upscale import (
        _pipeline,
        make_device_banks,
        parity_planes_supported,
    )

    h, w, u = 1024, 2048, 2.0
    baseline_ms = 2.0
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--full" in sys.argv[1:]:
        # every opt-in field in one process: the round's committed bench
        # record (BENCH_FULL_rXX.json) so non-flagship tiers can't
        # regress invisibly round-over-round
        sys.argv += ["--matrix", "--big", "--bigfrac", "--bigc2c",
                     "--grid", "--big16k", "--na8640"]
    stages = "--stages" in sys.argv[1:]
    matrix = "--matrix" in sys.argv[1:]
    k2 = int(args[0]) if args else 40
    # 3 interleaved passes + median everywhere (incl. the plain flagship
    # run the driver records): re-measurement is seconds per pass once
    # compiles are cached, and the median is what rejects this host's
    # 0.0-class ack artifacts and pass-1 warmup alike
    passes = 3
    for i, a in enumerate(sys.argv[1:]):
        if a == "--passes":
            passes = int(sys.argv[1:][i + 1])

    plan = UpscalePlan(
        h=h,
        w=w,
        upscale=u,
        precision=Precision.HALF,  # reference headline is -p 2 (fp16 mode)
        sharpen=0.2,
        engine=Engine.AUTO,
    )
    engine = plan.resolve_engine()
    # device output layout = what the PNG encoder consumes: planar
    # channels, and for u=2 the parity-plane pair (even/odd output rows) —
    # the reference's timed region also ends at planar GPU buffers, with
    # host interleave after the fence (VkResample.cpp:1697-1754)
    planes = parity_planes_supported(plan)
    pipeline = functools.partial(
        _pipeline, plan=plan, engine=engine, planar_out=True, planes_out=planes
    )
    banks = make_device_banks(plan, engine)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    x = jax.device_put(img, jax.devices()[0])

    # (key, thunk) measurement list, executed in interleaved passes below
    jobs: list = [
        (
            "__flagship__",
            lambda: time_device(
                pipeline, x, aux=banks, k1=max(2, k2 // 5), k2=k2, reps=3
            ),
        )
    ]

    if stages:
        # per-stage split (each an extra compile; opt-in): x stage alone,
        # x+y stages, full pipeline -> localizes regressions.  Unused
        # planes DCE away, so slicing r2c_quad's outputs isolates stages.
        import jax.numpy as jnp

        from vkresample_tpu.fft import dense
        from vkresample_tpu.ops import cas as cas_ops

        prec = plan.precision.matmul_precision

        codec = dict(
            store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage
        )

        def x_only(xx, bb):
            xr = jnp.moveaxis(xx, -1, 0)
            Ps = dense.r2c_quad(xr, bb, prec, **codec)
            return Ps[:2]

        def xy(xx, bb):
            xr = jnp.moveaxis(xx, -1, 0)
            return dense.r2c_quad(xr, bb, prec, **codec)

        jobs.append((
            "__stage_x__",
            lambda: time_device(x_only, x, aux=banks, k1=max(2, k2 // 5), k2=k2),
        ))
        jobs.append((
            "__stage_xy__",
            lambda: time_device(xy, x, aux=banks, k1=max(2, k2 // 5), k2=k2),
        ))

    if matrix:
        # non-flagship tiers (each an extra compile; opt-in) so the c2c,
        # fractional, fp32-single, and woven library-API routes can't
        # regress invisibly (round-2 verdict weak #5)
        km = max(6, k2 // 4)

        def _job(key, mplan, planes_out_, planar=True):
            eng = mplan.resolve_engine()
            bb = make_device_banks(mplan, eng, planes=planes_out_)
            fn = functools.partial(
                _pipeline, plan=mplan, engine=eng, planar_out=planar,
                planes_out=planes_out_,
            )
            jobs.append((
                key,
                lambda: time_device(fn, x, aux=bb, k1=max(2, km // 3), k2=km),
            ))

        _job(
            "single_fp32_ms",
            UpscalePlan(h=h, w=w, upscale=u, precision=Precision.SINGLE,
                        sharpen=0.2, engine=Engine.AUTO),
            planes,
        )
        _job(
            "c2c_ms",
            UpscalePlan(h=h, w=w, upscale=u, precision=Precision.HALF,
                        sharpen=0.2, r2c=False, engine=Engine.AUTO),
            False,
        )
        _job(
            "frac_u1_5_ms",
            UpscalePlan(h=h, w=w, upscale=1.5, precision=Precision.HALF,
                        sharpen=0.2, engine=Engine.AUTO),
            False,
        )
        _job("woven_half_ms", plan, False)

    def _big_job(key, bplan, hw, k1, k2_, seed=1):
        beng = bplan.resolve_engine()
        bbanks = make_device_banks(bplan, beng, planes=True)
        bx = jax.device_put(
            rng.integers(0, 256, size=hw + (3,), dtype=np.uint8)
        )
        bfn = functools.partial(
            _pipeline, plan=bplan, engine=beng, planes_out=True
        )
        jobs.append((
            key,
            lambda: time_device(bfn, bx, aux=bbanks, k1=k1, k2=k2_),
        ))

    if "--big" in sys.argv[1:]:
        # staged big tier (opt-in: ~2-3 min extra compile): the 8K->16K
        # frame that headlines the round-3 staged circulant work
        _big_job(
            "big_8k_to_16k_ms",
            UpscalePlan(h=4096, w=8192, upscale=2.0, precision=Precision.HALF,
                        sharpen=0.2, engine=Engine.AUTO),
            (4096, 8192), 2, 8,
        )

    if "--bigfrac" in sys.argv[1:]:
        # fractional big tier (opt-in): 4608x6144 -u 1.5 -> 6912x9216 on
        # the decimated staged grid route (round-3; previously fell to
        # the big-spectrum route, which does not survive >8K)
        _big_job(
            "bigfrac_u1_5_to_9216_ms",
            UpscalePlan(h=4608, w=6144, upscale=1.5, precision=Precision.HALF,
                        sharpen=0.2, engine=Engine.AUTO),
            (4608, 6144), 2, 8,
        )

    if "--bigc2c" in sys.argv[1:]:
        # c2c big tier (opt-in): 4096x8192 -c2c 2x half on the complex
        # staged grid route (round-3; previously the ~3x slower phases
        # route)
        _big_job(
            "bigc2c_8k_to_16k_ms",
            UpscalePlan(h=4096, w=8192, upscale=2.0, precision=Precision.HALF,
                        sharpen=0.2, r2c=False, engine=Engine.AUTO),
            (4096, 8192), 2, 8,
        )

    if "--big16k" in sys.argv[1:]:
        # 16K->32K 3-channel (opt-in): the largest user-surface frame —
        # 8192x16384 -> 16384x32768 half, batched channels (127.5 ms
        # on-chip = exactly 3x the 1-channel program, scripts/
        # big16k_3ch.py; ~1.6e9 output elements fit HBM)
        _big_job(
            "big16k_to_32k_3ch_ms",
            UpscalePlan(h=8192, w=16384, upscale=2.0, precision=Precision.HALF,
                        sharpen=0.2, engine=Engine.AUTO, channels=3),
            (8192, 16384), 1, 4,
        )

    if "--na8640" in sys.argv[1:]:
        # non-128-aligned 7-smooth big tier (opt-in): 8640 = 2^6*3^3*5,
        # above the dense cap with no 128-multiple divisor — rides the
        # staged tier via x_split_prefer's padded-vreg window (n1=120)
        # and the CAS replicate-pad path (round 5; previously the ~7x
        # phases cliff, VERDICT r4 missing #1)
        _big_job(
            "na8640_to_17280_ms",
            UpscalePlan(h=8640, w=8640, upscale=2.0, precision=Precision.HALF,
                        sharpen=0.2, engine=Engine.AUTO),
            (8640, 8640), 1, 4,
        )

    if "--grid" in sys.argv[1:]:
        # u=3 big grid tier (opt-in): 2048x4096 -> 6144x12288 3x half on
        # the u-generic staged grid route (round-3; the pre-grid phases
        # route measured ~6.6 s on this frame)
        _big_job(
            "grid_u3_to_12288_ms",
            UpscalePlan(h=2048, w=4096, upscale=3.0, precision=Precision.HALF,
                        sharpen=0.2, engine=Engine.AUTO),
            (2048, 4096), 2, 8,
        )

    # interleaved passes: every tier each pass; with >= 3 passes the
    # reported value is the MEDIAN across passes, else the min.  min was
    # the round-5 protocol, but this tunnel occasionally acks a forced
    # readback before execution even inside time_device — one officials
    # process returned c2c 0.0000 and flagship 0.71 (under the 1.23-1.37
    # host band) in single passes while every big tier agreed to a few %
    # across all three.  The median is robust against both that artifact
    # and pass-1 warmup; for the stable big tiers it coincides with min
    # to within the pass spread.
    vals_all: dict = {}

    def _run_pass(p: int) -> None:
        for key, th in jobs:
            v = th()
            vals_all.setdefault(key, []).append(v)
            print(
                f"# pass {p} {key} {v:.4f} ms", file=sys.stderr, flush=True
            )

    total = max(1, passes)
    for p in range(total):
        _run_pass(p + 1)
    if passes > 1:
        # adaptive extra passes: everything is compiled by now, so a pass
        # costs execution only — minutes at worst, vs a garbage official
        for _ in range(EXTRA_PASSES):
            bad = sorted(k for k, vs in vals_all.items() if _unstable(vs))
            if not bad:
                break
            total += 1
            print(
                f"# unstable tiers {bad}: running extra pass {total}",
                file=sys.stderr, flush=True,
            )
            _run_pass(total)

    vals = {}
    unstable = set()
    for key, vs in vals_all.items():
        if passes > 1 and _unstable(vs):
            unstable.add(key)
        vals[key] = _robust_value(vs)

    ms = vals.pop("__flagship__")
    result = {
        "metric": "upscale_2048x1024_to_4096x2048_fp16_ms_per_frame",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 3) if ms > 0 else 0.0,
    }
    if "__flagship__" in unstable:
        result["flagship_unstable"] = True
    if stages:
        ms_x = vals.pop("__stage_x__")
        ms_xy = vals.pop("__stage_xy__")
        unstable.discard("__stage_x__")
        unstable.discard("__stage_xy__")
        result["stage_x_matmul_ms"] = round(ms_x, 4)
        result["stage_y_matmul_ms"] = round(ms_xy - ms_x, 4)
        result["stage_cas_ms"] = round(ms - ms_xy, 4)
    for key, v in vals.items():
        result[("unstable_" + key) if key in unstable else key] = round(v, 4)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
