"""Golden-image regression: committed oracle outputs for the sample frame.

The reference's correctness story was visual comparison against committed
sample images (SURVEY §4); these goldens make that check mechanical and
implementation-independent (they are oracle outputs, regenerated only if
the pipeline *semantics* change)."""
import os

import numpy as np
import pytest

from vkresample_tpu import Engine, UpscalePlan, upscale
from vkresample_tpu.io.png import read_png

_ROOT = os.path.join(os.path.dirname(__file__), "..", "samples")


@pytest.mark.parametrize("u,golden", [(2.0, "golden_256x128_x2.png"),
                                      (1.5, "golden_256x128_x1.5.png")])
@pytest.mark.parametrize("engine", [Engine.MXU, Engine.XLA])
def test_sample_matches_golden(u, golden, engine):
    img = read_png(os.path.join(_ROOT, "test_256x128.png"))
    want = read_png(os.path.join(_ROOT, golden))
    plan = UpscalePlan(h=128, w=256, upscale=u, engine=engine)
    got = np.asarray(upscale(img, u, plan=plan))
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_reference_1080p_sample_vs_oracle():
    """The reference's own 1920x1080 sample frame through the full HALF
    pipeline (the headline usage: 1080p -> 4K) vs the fp64 oracle.
    1920 is lane-aligned (% 128 == 0), so this exercises the production
    quad route at a real content geometry."""
    from vkresample_tpu import Precision
    from vkresample_tpu.oracle import numpy_ref as oracle

    img = read_png(os.path.join(_ROOT, "test_1920x1080.png"))
    assert img.shape == (1080, 1920, 3)
    plan = UpscalePlan(
        h=1080, w=1920, upscale=2.0, precision=Precision.HALF,
        engine=Engine.MXU,
    )
    got = np.asarray(upscale(img, 2.0, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert got.shape == want.shape == (2160, 3840, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
