"""Plan/scheduler unit tests: 7-smooth factorization and zero-band geometry
(reference semantics: vkFFT.h:4716-4726 factorization; band math
VkResample.cpp:1491-1502)."""
import numpy as np
import pytest

from vkresample_tpu.core.plan import UpscalePlan, output_dims
from vkresample_tpu.core.smooth import factorize_7smooth, is_7smooth, plan_factors


def test_factorize_7smooth():
    assert factorize_7smooth(1) == []
    assert factorize_7smooth(2048) == [2] * 11
    assert factorize_7smooth(1029) == [3, 7, 7, 7]
    assert sorted(factorize_7smooth(2 * 3 * 5 * 7)) == [2, 3, 5, 7]
    with pytest.raises(ValueError):
        factorize_7smooth(11)
    with pytest.raises(ValueError):
        factorize_7smooth(2 * 13)


def test_is_7smooth():
    assert is_7smooth(4096) and is_7smooth(2100) and is_7smooth(1)
    assert not is_7smooth(1920 * 0 + 11) and not is_7smooth(1021)


@pytest.mark.parametrize("n", [2048, 4096, 1024, 3072, 5040, 128, 129024 // 126 * 7])
def test_plan_factors_product_and_bounds(n):
    fs = plan_factors(n, 128)
    p = 1
    for f in fs:
        assert 1 <= f <= 128
        p *= f
    assert p == n


def test_plan_factors_examples():
    assert plan_factors(2048) == (128, 16)
    assert plan_factors(4096) == (128, 32)
    assert plan_factors(1024) == (128, 8)


def test_output_dims_trunc():
    assert output_dims(1024, 2048, 2.0) == (2048, 4096)
    assert output_dims(1024, 2048, 1.5) == (1536, 3072)
    # truncation follows C float semantics exactly: 1.27f*100 rounds to
    # exactly 127.0f -> 127, while 2.999*100 = 299.9f -> 299
    assert output_dims(100, 100, 1.27) == (127, 127)
    assert output_dims(100, 100, 2.999) == (299, 299)


def test_plan_bands_2x_even():
    p = UpscalePlan(h=1024, w=2048, upscale=2.0)
    assert (p.H, p.W) == (2048, 4096)
    assert (p.y_left, p.y_right) == (512, 1536)
    assert (p.x_left, p.x_right) == (1024, 2048)
    assert p.kept_lo_y == 512 and p.kept_hi_y == 512
    assert p.kept_lo_x == 1024 and p.kept_hi_x == 0
    assert p.integer_upscale == 2


def test_plan_bands_1p5x():
    p = UpscalePlan(h=1024, w=2048, upscale=1.5)
    assert (p.H, p.W) == (1536, 3072)
    assert p.y_left == 512 and p.y_right == 1024
    assert p.x_left == 1024 and p.x_right == 1536
    assert p.integer_upscale is None


def test_plan_identity():
    p = UpscalePlan(h=256, w=512, upscale=1.0)
    assert (p.H, p.W) == (256, 512)
    # empty zero band: everything kept
    assert p.kept_lo_y + p.kept_hi_y == 256
    assert p.integer_upscale == 1


def test_plan_c2c_bands():
    p = UpscalePlan(h=512, w=512, upscale=2.0, r2c=False)
    assert p.x_left == 256 and p.x_right == 1024 - 256
    assert p.kept_hi_x == 256


def test_plan_rejects_downscale():
    with pytest.raises(ValueError):
        UpscalePlan(h=256, w=256, upscale=0.5)


def test_7smooth_validation():
    p = UpscalePlan(h=1022, w=1024, upscale=2.0)  # 1022 = 2*7*73, not smooth
    with pytest.raises(ValueError):
        p.validate_7smooth()
    UpscalePlan(h=1024, w=2048, upscale=2.0).validate_7smooth()


def test_rejects_odd_height_garbage_read_geometry():
    # odd h with u=2: the inverse zero band ends before the relocated rows
    # start -> the reference would read uninitialized memory; we reject
    with pytest.raises(ValueError, match="unsupported geometry"):
        UpscalePlan(h=1021, w=1024, upscale=2.0)


def test_odd_height_identity_upscale_allowed():
    # u=1 with odd dims: every spectrum row is written by the forward pass
    # (H == h), so the geometry is valid — the pipeline is CAS-only
    p = UpscalePlan(h=33, w=48, upscale=1.0)
    assert (p.H, p.W) == (33, 48)
    assert p.kept_lo_y + p.kept_hi_y == 33
