"""MXU-tier FFT engine tests: mixed-radix matmul FFT, packed R2C forward,
phase-decomposed zero-band inverse, and the full MXU pipeline vs oracle."""
import numpy as np
import pytest
from jax import numpy as jnp

from conftest import make_test_image
from vkresample_tpu import Engine, Precision, UpscalePlan, upscale
from vkresample_tpu.core.plan import UpscalePlan as Plan
from vkresample_tpu.fft.mixed_radix import fft
from vkresample_tpu.fft.rfft2 import ifft2_phases_c2c, irfft2_phases, rfft2_packed
from vkresample_tpu.oracle import numpy_ref as oracle


def _cp(z, dtype=jnp.float32):
    return jnp.asarray(z.real, dtype), jnp.asarray(z.imag, dtype)


def _np(p):
    return np.asarray(p[0]) + 1j * np.asarray(p[1])


@pytest.mark.parametrize("n", [2, 8, 96, 105, 128, 540, 2048])
def test_mixed_radix_vs_numpy_last_axis(n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(2, 3, n)) + 1j * rng.normal(size=(2, 3, n))
    got = _np(fft(_cp(x)))
    want = np.fft.fft(x)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5
    # inverse roundtrip, normalized
    back = _np(fft(_cp(got), inverse=True))
    assert np.max(np.abs(back - x)) < 1e-4


@pytest.mark.parametrize("n", [6, 64, 360])
def test_mixed_radix_axis_minus2(n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(2, n, 5)) + 1j * rng.normal(size=(2, n, 5))
    got = _np(fft(_cp(x), axis=-2))
    want = np.fft.fft(x, axis=-2)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


@pytest.mark.parametrize("shape", [(64, 96), (32, 140), (2, 256)])
def test_rfft2_packed_vs_numpy(shape):
    rng = np.random.default_rng(1)
    x = rng.random((3,) + shape)
    got = _np(rfft2_packed(jnp.asarray(x, jnp.float32)))
    want = np.fft.rfft2(x)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


@pytest.mark.parametrize("u", [1, 2, 3])
def test_irfft2_phases_vs_oracle_big_spectrum(u):
    h, w = 48, 96
    rng = np.random.default_rng(u)
    x = rng.random((2, h, w))
    plan = Plan(h=h, w=w, upscale=float(u))
    F = rfft2_packed(jnp.asarray(x, jnp.float32))
    got = np.asarray(
        irfft2_phases(F, h, w, u, keep_nyquist=(plan.kept_hi_x > 0))
    )
    want = np.stack(
        [
            u * u * np.fft.irfft2(
                oracle.assemble_big_spectrum(np.fft.rfft2(x[c]), plan),
                s=(plan.H, plan.W),
            )
            for c in range(2)
        ]
    )
    assert np.max(np.abs(got - want)) < 1e-5


@pytest.mark.parametrize("u", [1, 2])
def test_ifft2_phases_c2c_vs_oracle(u):
    h, w = 32, 48
    rng = np.random.default_rng(u + 10)
    x = rng.random((2, h, w))
    plan = Plan(h=h, w=w, upscale=float(u), r2c=False)
    zeros = jnp.zeros((2, h, w), jnp.float32)
    F = fft(fft((jnp.asarray(x, jnp.float32), zeros)), axis=-2)
    yr, yi = ifft2_phases_c2c(F, h, w, u)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.stack(
        [
            u * u * np.fft.ifft2(
                oracle.assemble_big_spectrum(np.fft.fft2(x[c]), plan)
            )
            for c in range(2)
        ]
    )
    assert np.max(np.abs(got - want)) < 1e-5


@pytest.mark.parametrize("r2c", [True, False])
@pytest.mark.parametrize("u", [1.0, 2.0, 3.0])
def test_mxu_pipeline_matches_oracle(u, r2c):
    img = make_test_image(64, 96, 3, seed=20)
    plan = Plan(h=64, w=96, upscale=u, r2c=r2c, engine=Engine.MXU)
    got = np.asarray(upscale(img, u, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_mxu_matches_xla_tier():
    img = make_test_image(64, 128, 3, seed=21)
    p_mxu = Plan(h=64, w=128, upscale=2.0, engine=Engine.MXU)
    p_xla = Plan(h=64, w=128, upscale=2.0, engine=Engine.XLA)
    a = np.asarray(upscale(img, 2.0, plan=p_mxu))
    b = np.asarray(upscale(img, 2.0, plan=p_xla))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_auto_engine_routing():
    p = Plan(h=64, w=128, upscale=2.0, engine=Engine.AUTO)
    assert p.resolve_engine() is Engine.MXU
    # fractional but 7-smooth output: still MXU (dense)
    p2 = Plan(h=64, w=128, upscale=1.5, engine=Engine.AUTO)
    assert p2.resolve_engine() is Engine.MXU
    # small non-7-smooth dims: dense DFT handles any size
    p3 = Plan(h=64, w=127 * 2, upscale=1.5, engine=Engine.AUTO)
    assert p3.mxu_mode == "dense"
    assert p3.resolve_engine() is Engine.MXU


def test_mxu_non_smooth_dense_matches_oracle():
    # 127 is prime: the reference engine would reject this size; the dense
    # DFT engine handles it (capability superset), still oracle-exact
    img = make_test_image(64, 127, 3, seed=24)
    plan = Plan(h=64, w=127, upscale=2.0, engine=Engine.MXU)
    got = np.asarray(upscale(img, 2.0, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_mxu_half_precision():
    img = make_test_image(64, 64, 3, seed=22)
    plan = Plan(
        h=64, w=64, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    got = np.asarray(upscale(img, 2.0, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("r2c", [True, False])
def test_mxu_fractional_dense(r2c):
    """Fractional factors run on the dense zero-band engine and must match
    the oracle."""
    img = make_test_image(64, 128, 3, seed=23)
    plan = Plan(h=64, w=128, upscale=1.5, r2c=r2c, engine=Engine.MXU)
    assert plan.mxu_mode == "dense"
    got = np.asarray(upscale(img, 1.5, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert got.shape == want.shape == (96, 192, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_mxu_mode_classification():
    assert Plan(h=64, w=128, upscale=2.0).mxu_mode == "dense"
    # beyond the dense matrix cap the mixed-radix paths take over
    assert Plan(h=8192, w=8192, upscale=2.0).mxu_mode == "phases"
    assert Plan(h=8192, w=8192, upscale=1.5).mxu_mode == "big"
    assert Plan(h=8192, w=8188, upscale=2.0).mxu_mode is None  # 2047=23*89


@pytest.mark.parametrize("r2c", [True, False])
@pytest.mark.parametrize("u", [2.0, 1.5])
def test_mixed_radix_paths_still_route(monkeypatch, u, r2c):
    """Force the dense threshold down so the phases/big mixed-radix paths
    keep end-to-end coverage."""
    from vkresample_tpu.fft import mxu_pipeline

    monkeypatch.setattr(mxu_pipeline, "DENSE_MAX", 1)
    img = make_test_image(64, 96, 3, seed=25)
    plan = Plan(h=64, w=96, upscale=u, r2c=r2c, engine=Engine.MXU)
    from vkresample_tpu.ops import cas as cas_ops
    import jax.numpy as jnp

    x = jnp.moveaxis(cas_ops.normalize_u8(jnp.asarray(img), jnp.float32), -1, 0)
    out = mxu_pipeline.upscale_core_mxu(x, plan)
    got = np.asarray(jnp.moveaxis(cas_ops.quantize_u8(out), 0, -1))
    want = oracle.upscale_oracle(img, plan)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_mxu_dense_odd_dims_identity():
    # odd dims at u=1 (identity + CAS): dense engine keep-Nyquist path
    img = make_test_image(33, 49, 3, seed=26)
    plan = Plan(h=33, w=49, upscale=1.0, engine=Engine.MXU)
    assert plan.mxu_mode == "dense"
    got = np.asarray(upscale(img, 1.0, plan=plan))
    want = oracle.upscale_oracle(img, plan)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
