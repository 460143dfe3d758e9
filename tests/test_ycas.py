"""Fused y-matmul+weave+CAS+quantize kernel vs the fp64 oracle
(interpret mode on CPU; the compiled path is exercised on real TPU by
bench/CLI and scripts/ycas_ab.py)."""
import jax
import numpy as np
from jax import numpy as jnp

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops.cas import to_i16_storage
from vkresample_tpu.ops.ycas_pallas import ycas_u2, ycas_u2_supported
from vkresample_tpu.oracle import numpy_ref as oracle


def _setup(h=64, w=256, seed=5):
    import os

    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    # the ycas banks are experiment-only (rejected kernel) and are built
    # only on request so production plans don't upload dead banks
    os.environ["VKRESAMPLE_YCAS_BANKS"] = "1"
    try:
        banks = mxu_pipeline.make_dense_banks(plan)
    finally:
        os.environ.pop("VKRESAMPLE_YCAS_BANKS", None)
    assert "ycasYT" in banks
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    x_raw = jnp.moveaxis(jnp.asarray(img), -1, 0)
    U, T2 = dense.r2c_x_only(x_raw, banks, jax.lax.Precision.HIGHEST)
    want = np.moveaxis(oracle.upscale_oracle(img, plan), -1, 0)
    return banks, U, T2, want


def test_ycas_f32_matches_oracle():
    banks, U, T2, want = _setup()
    got = np.asarray(
        ycas_u2(U, T2, jnp.asarray(banks["ycasYT"]), 0.2, Wb=128, bo=16,
                mm="highest", interpret=True)
    )
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_ycas_i16_matches_oracle():
    banks, U, T2, want = _setup(seed=7)
    got = np.asarray(
        ycas_u2(to_i16_storage(U), T2, jnp.asarray(banks["ycasYT2"]), 0.2,
                Wb=128, bo=16, mm="bf16x3", interpret=True)
    )
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_ycas_band_pipeline_edges():
    """Two-band minimum geometry (top band feeds bottom band's halo)."""
    banks, U, T2, want = _setup(h=32, w=192, seed=9)
    got = np.asarray(
        ycas_u2(U, T2, jnp.asarray(banks["ycasYT"]), 0.2, Wb=128, bo=16,
                mm="highest", interpret=True)
    )
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_ycas_supported_predicate():
    assert ycas_u2_supported((3, 1024, 4096), 4096, 512, 128)
    assert not ycas_u2_supported((3, 1024, 512), 512, 512, 128)  # W too narrow
    assert not ycas_u2_supported((3, 100, 4096), 4096, 512, 128)  # h % bo
    assert not ycas_u2_supported((3, 1024, 4096), 4096, 320, 128)  # Wb % 128


def test_ycas_parity_i16_matches_oracle():
    """Fused y-matmul + per-parity CAS (no interleave): planes match the
    oracle's even/odd rows."""
    from vkresample_tpu.ops.ycas_pallas import ycas_parity_u2

    banks, U, T2, want = _setup(seed=11)
    E, D = ycas_parity_u2(
        to_i16_storage(U), T2, jnp.asarray(banks["ycasYT2"]), 0.2,
        Wb=128, bo=16, interpret=True,
    )
    got = np.stack([np.asarray(E), np.asarray(D)], axis=-2).reshape(want.shape)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_ycas_parity_single_band():
    """nb == 1 geometry (whole column in one band)."""
    from vkresample_tpu.ops.ycas_pallas import ycas_parity_u2

    banks, U, T2, want = _setup(h=32, w=192, seed=13)
    E, D = ycas_parity_u2(
        to_i16_storage(U), T2, jnp.asarray(banks["ycasYT2"]), 0.2,
        Wb=128, bo=16, interpret=True,
    )
    got = np.stack([np.asarray(E), np.asarray(D)], axis=-2).reshape(want.shape)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
