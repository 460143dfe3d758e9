"""Dense-DFT engine primitives vs numpy (per-axis banks and the collapsed
chains used by the MXU pipeline)."""
import jax
import numpy as np
import pytest
from jax import numpy as jnp

from vkresample_tpu.core.config import Engine
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense
from vkresample_tpu.oracle import numpy_ref as oracle

HIGHEST = jax.lax.Precision.HIGHEST


def test_fwd_r2c_x_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.random((2, 16, 48)).astype(np.float32)
    K = 48 // 2 + 1
    Xr, Xi = dense.fwd_r2c_x(jnp.asarray(x), K, HIGHEST)
    want = np.fft.rfft(x, axis=-1)
    got = np.asarray(Xr) + 1j * np.asarray(Xi)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_fwd_c2c_y_matches_numpy():
    rng = np.random.default_rng(1)
    z = rng.random((2, 24, 5)) + 1j * rng.random((2, 24, 5))
    got = dense.fwd_c2c_y((jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32)), HIGHEST)
    want = np.fft.fft(z, axis=-2)
    g = np.asarray(got[0]) + 1j * np.asarray(got[1])
    assert np.max(np.abs(g - want)) / np.max(np.abs(want)) < 1e-5


def test_inv_y_zero_band_matches_oracle_assembly():
    h, H = 16, 32
    plan = UpscalePlan(h=h, w=32, upscale=2.0)
    rng = np.random.default_rng(2)
    F = rng.random((h, 9)) + 1j * rng.random((h, 9))
    got = dense.inv_y(
        (jnp.asarray(F.real, jnp.float32), jnp.asarray(F.imag, jnp.float32)),
        h, H, plan.kept_lo_y, plan.kept_hi_y, HIGHEST,
    )
    # oracle: relocate rows into the big spectrum, inverse FFT over y, * h
    G = np.zeros((H, 9), complex)
    G[: plan.kept_lo_y] = F[: plan.kept_lo_y]
    G[H - plan.kept_hi_y :] = F[h - plan.kept_hi_y :]
    want = np.fft.ifft(G, axis=0) * H / h  # inv_y normalizes by 1/h
    g = np.asarray(got[0]) + 1j * np.asarray(got[1])
    assert np.max(np.abs(g - want)) < 1e-4


def test_inv_x_r2c_matches_irfft():
    w, W = 32, 64
    plan = UpscalePlan(h=16, w=w, upscale=2.0)
    rng = np.random.default_rng(3)
    K = w // 2
    P = rng.random((4, K)) + 1j * rng.random((4, K))
    got = np.asarray(
        dense.inv_x_r2c(
            (jnp.asarray(P.real, jnp.float32), jnp.asarray(P.imag, jnp.float32)),
            w, W, plan.kept_lo_x, False, HIGHEST,
        )
    )
    G = np.zeros((4, W // 2 + 1), complex)
    G[:, :K] = P
    want = np.fft.irfft(G, n=W, axis=-1) * W / w  # 1/w normalization
    assert np.max(np.abs(got - want)) < 1e-5


def test_r2c_rows_weave_equals_chain():
    plan = UpscalePlan(h=32, w=64, upscale=2.0, engine=Engine.MXU)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (3, 32, 64), np.uint8)
    rows_banks = dense.r2c_rows_banks(plan, "float32")
    chain_banks = dense.r2c_chain_banks(plan, "float32")
    U, O = dense.r2c_rows(jnp.asarray(img), rows_banks, HIGHEST)
    a = np.asarray(dense.weave_rows(U, O, 2))
    b = np.asarray(
        dense.r2c_chain(jnp.asarray(img, jnp.float32) / 255.0, chain_banks, HIGHEST)
    )
    assert np.max(np.abs(a - b)) < 2e-4


def test_c2c_chain_matches_oracle():
    plan = UpscalePlan(h=16, w=24, upscale=2.0, r2c=False)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 24, 1), np.uint8)
    banks = dense.c2c_chain_banks(plan, "float32")
    x = jnp.asarray(img[:, :, 0], jnp.float32)[None] / 255.0
    got = np.asarray(dense.c2c_chain(x, banks, HIGHEST))[0]
    want = oracle.upscale_oracle_float(img, plan)[:, :, 0]
    # oracle includes CAS; compare pre-CAS via the spectrum route instead
    F = np.fft.fft2(img[:, :, 0] / 255.0)
    G = oracle.assemble_big_spectrum(F, plan)
    want = 4.0 * np.abs(np.fft.ifft2(G))
    assert np.max(np.abs(got - want)) < 1e-4


def test_r2c_quad_codec_matches_uncoded():
    """The int16 Q2.14 store/load staging inside r2c_quad must agree with
    the unstaged f32 path to within the staging quantum (the y matmul
    reads dequantized planes — error bound 2^-14 * sum|Y| per pixel)."""
    from vkresample_tpu.ops import cas as cas_ops

    plan = UpscalePlan(h=32, w=128, upscale=2.0, engine=Engine.MXU)
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (3, 32, 128), np.uint8)
    banks = dense.r2c_rows_banks(plan, "float32")
    assert "alpha_odd_hi" in banks
    Pf = dense.r2c_quad(jnp.asarray(img), banks, HIGHEST)
    Pq = dense.r2c_quad(
        jnp.asarray(img), banks, HIGHEST,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
    )
    for f, q in zip(Pf, Pq):
        assert q.dtype == jnp.int16
        d = np.abs(np.asarray(q, np.float64) / 16384.0 - np.asarray(f, np.float64))
        assert d.max() < 3e-3, d.max()


def test_r2c_rows_codec_matches_uncoded():
    from vkresample_tpu.ops import cas as cas_ops

    plan = UpscalePlan(h=32, w=64, upscale=2.0, engine=Engine.MXU)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (3, 32, 64), np.uint8)
    banks = dense.r2c_rows_banks(plan, "float32")
    Uf, Of = dense.r2c_rows(jnp.asarray(img), banks, HIGHEST)
    Uq, Oq = dense.r2c_rows(
        jnp.asarray(img), banks, HIGHEST,
        store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage,
    )
    for f, q in zip((Uf, Of), (Uq, Oq)):
        assert q.dtype == jnp.int16
        d = np.abs(np.asarray(q, np.float64) / 16384.0 - np.asarray(f, np.float64))
        assert d.max() < 3e-3, d.max()


def test_r2c_quad_int8_route_matches_plain_staging(monkeypatch):
    """The int8 MXU route (HALF plans build digit banks; active at
    precision != HIGHEST) must agree with the plain i16-staged matmul
    path to well under a u8 LSB (x digits err ~0.01 LSB, y digits + bf16
    residual ~0.01 LSB)."""
    import jax as _jax

    from vkresample_tpu.core.config import Precision
    from vkresample_tpu.ops import cas as cas_ops

    plan = UpscalePlan(
        h=32, w=128, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (3, 32, 128), np.uint8)
    banks = dense.r2c_rows_banks(plan, "float32")
    assert "xq_d1" in banks  # HALF plans build the digit banks
    codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
    HIGH = _jax.lax.Precision.HIGH
    Pi = dense.r2c_quad(jnp.asarray(img), banks, HIGH, **codec)
    # HIGHEST disables the route (the accuracy override keeps meaning)
    Pp = dense.r2c_quad(jnp.asarray(img), banks, HIGHEST, **codec)
    for a, b in zip(Pi, Pp):
        d = np.abs(
            np.asarray(a, np.float64) / 16384.0
            - np.asarray(b, np.float64) / 16384.0
        )
        assert d.max() < 1.5e-3, d.max()  # ~0.4 u8 LSB headroom
    # the NO_INT8 opt-out acts at BANK BUILD time (advisor round-2 fix:
    # route is decided from bank content, never from env at trace time)
    monkeypatch.setenv("VKRESAMPLE_NO_INT8", "1")
    banks_off = dense.r2c_rows_banks(plan, "float32")
    assert "xq_d1" not in banks_off
    Po = dense.r2c_quad(jnp.asarray(img), banks_off, HIGH, **codec)
    for a, b in zip(Po, Pp):
        d = np.abs(
            np.asarray(a, np.int32) - np.asarray(b, np.int32)
        )
        assert d.max() <= 2  # HIGH vs HIGHEST matmul rounding only


def test_r2c_rows_int8_route_matches_plain_staging():
    import jax as _jax

    from vkresample_tpu.core.config import Precision
    from vkresample_tpu.ops import cas as cas_ops

    plan = UpscalePlan(
        h=32, w=64, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (3, 32, 64), np.uint8)
    banks = dense.r2c_rows_banks(plan, "float32")
    assert "xqf_d1" in banks
    codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
    Ui, Oi = dense.r2c_rows(jnp.asarray(img), banks, _jax.lax.Precision.HIGH, **codec)
    Up, Op = dense.r2c_rows(jnp.asarray(img), banks, HIGHEST, **codec)
    for a, b in zip((Ui, Oi), (Up, Op)):
        d = np.abs(
            np.asarray(a, np.float64) / 16384.0
            - np.asarray(b, np.float64) / 16384.0
        )
        assert d.max() < 1.5e-3, d.max()


def test_r2c_quad_int8_only_banks_match_regular():
    """The big-tier int8-only bank set (r2c_quad_int8_banks — no f32
    alpha/Ymat matrices, beta pre-split in bf16) must reproduce the
    regular quad banks' int8 route to within the bf16 correction
    rounding."""
    import jax as _jax

    from vkresample_tpu.core.config import Precision
    from vkresample_tpu.ops import cas as cas_ops

    plan = UpscalePlan(
        h=32, w=128, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (3, 32, 128), np.uint8)
    big = dense.r2c_quad_int8_banks(plan)
    assert "Ymat_ns" not in big and "xq_d1" in big
    reg = dense.r2c_rows_banks(plan, "float32")
    codec = dict(store=cas_ops.to_i16_storage, load=cas_ops.from_i16_storage)
    HIGH = _jax.lax.Precision.HIGH
    Pb = dense.r2c_quad(jnp.asarray(img), big, HIGH, **codec)
    Pr = dense.r2c_quad(jnp.asarray(img), reg, HIGH, **codec)
    for a, b in zip(Pb, Pr):
        d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
        assert d.max() <= 24, d.max()  # bf16 beta rounding, Q2.14 ticks

    # without the codec the int8-only set must refuse loudly
    with pytest.raises(ValueError, match="int8-only"):
        dense.r2c_quad(jnp.asarray(img), big, HIGH)


def test_big_banks_routing_by_env(monkeypatch):
    """Big-tier bank routing: staged circulant banks are the default
    (they serve every matmul-precision mode, HIGHEST included); int8
    dense banks on VKRESAMPLE_BIG=int8; None for woven (planes=False)
    callers and when both tiers are suppressed."""
    from vkresample_tpu.core.config import Precision
    from vkresample_tpu.fft import mxu_pipeline

    plan = UpscalePlan(
        h=64, w=256, upscale=2.0, precision=Precision.HALF,
        engine=Engine.MXU,
    )
    monkeypatch.setattr(mxu_pipeline, "DENSE_MAX", 32)
    monkeypatch.setattr(mxu_pipeline, "DENSE_INT8_MAX", 512)
    monkeypatch.setenv("VKRESAMPLE_MM_PRECISION", "highest")
    banks = mxu_pipeline.make_dense_banks(plan, planes=True)
    assert banks is not None and "stx_b1" in banks
    monkeypatch.delenv("VKRESAMPLE_MM_PRECISION")
    # woven callers (planes=False) get staged banks too (quad planes +
    # the u16-packed column weave), but never the int8 dense set
    wb = mxu_pipeline.make_dense_banks(plan, planes=False)
    assert wb is not None and "stx_b1" in wb
    monkeypatch.setenv("VKRESAMPLE_BIG", "int8")
    assert mxu_pipeline.make_dense_banks(plan, planes=False) is None
    monkeypatch.delenv("VKRESAMPLE_BIG")
    # VKRESAMPLE_BIG=int8 selects the round-2 int8 dense tier
    monkeypatch.setenv("VKRESAMPLE_BIG", "int8")
    banks = mxu_pipeline.make_dense_banks(plan, planes=True)
    assert banks is not None and "xq_d1" in banks and "stx_b1" not in banks
    # ...which MM_PRECISION=highest suppresses entirely (phases fallback)
    monkeypatch.setenv("VKRESAMPLE_MM_PRECISION", "highest")
    assert mxu_pipeline.make_dense_banks(plan, planes=True) is None
