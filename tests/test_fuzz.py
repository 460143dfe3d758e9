"""Randomized geometry fuzz: random 7-smooth sizes x factors x modes x
engines, every output checked against the fp64 oracle."""
import numpy as np
import pytest

from conftest import make_test_image
from vkresample_tpu import Engine, Precision, UpscalePlan, upscale
from vkresample_tpu.core.smooth import is_7smooth
from vkresample_tpu.oracle import numpy_ref as oracle

_SMOOTH_EVEN = [d for d in range(24, 200, 2) if is_7smooth(d)]


def _cases():
    rng = np.random.default_rng(2026)
    cases = []
    for i in range(12):
        h = int(rng.choice(_SMOOTH_EVEN))
        w = int(rng.choice(_SMOOTH_EVEN))
        u = float(rng.choice([1.0, 1.5, 2.0, 3.0]))
        r2c = bool(rng.integers(2))
        engine = Engine.MXU if rng.integers(2) else Engine.XLA
        sharpen = float(rng.choice([0.0, 0.1, 0.2]))
        try:
            UpscalePlan(h=h, w=w, upscale=u, r2c=r2c, engine=engine)
        except ValueError:
            continue
        cases.append((h, w, u, r2c, engine, sharpen))
    return cases


@pytest.mark.parametrize("h,w,u,r2c,engine,sharpen", _cases())
def test_fuzz_matches_oracle(h, w, u, r2c, engine, sharpen):
    img = make_test_image(h, w, 3, seed=h * 1000 + w)
    plan = UpscalePlan(
        h=h, w=w, upscale=u, r2c=r2c, engine=engine, sharpen=sharpen
    )
    got = np.asarray(upscale(img, u, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, (
        h, w, u, r2c, engine, sharpen,
    )


# the staged grid routes gate on w % 128 == 0, which the random sizes
# above almost never produce — pin a lane-aligned slice so the c2c grid
# (any-size default) and fractional quad/grid forms stay fuzz-covered
@pytest.mark.parametrize(
    "h,w,u,r2c",
    [
        (48, 128, 2.0, False),
        (36, 256, 3.0, False),
        (64, 128, 1.5, False),
        (48, 256, 2.5, False),
        (64, 128, 1.5, True),
        (56, 256, 2.0, True),
    ],
)
def test_fuzz_lane_aligned_grid_routes(h, w, u, r2c):
    img = make_test_image(h, w, 3, seed=h * 7 + w)
    plan = UpscalePlan(
        h=h, w=w, upscale=u, r2c=r2c, engine=Engine.MXU,
        precision=Precision.HALF,
    )
    got = np.asarray(upscale(img, u, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
