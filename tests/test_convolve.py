"""Frequency-domain convolution (VkFFT engine capability surface) vs a
direct circular-convolution oracle."""
import numpy as np
import pytest
from jax import numpy as jnp

from vkresample_tpu.ops.convolve import (
    fft_convolve2d,
    fft_matrix_convolve2d,
    gaussian_kernel,
)


def circ_conv2d(x, k):
    h, w = x.shape
    out = np.zeros_like(x)
    for dy in range(h):
        for dx in range(w):
            if abs(k[dy, dx]) > 0:
                out += k[dy, dx] * np.roll(np.roll(x, dy, 0), dx, 1)
    return out


def test_single_kernel_matches_direct():
    rng = np.random.default_rng(0)
    x = rng.random((16, 24))
    k = np.zeros((16, 24))
    k[0, 0], k[0, 1], k[1, 0], k[15, 23] = 0.5, 0.2, 0.2, 0.1
    got = np.asarray(fft_convolve2d(jnp.asarray(x, jnp.float32), k.astype(np.float32)))
    want = circ_conv2d(x, k)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multi_kernel_batching():
    rng = np.random.default_rng(1)
    x = rng.random((3, 8, 16)).astype(np.float32)  # batch of 3
    ks = rng.random((4, 8, 16)).astype(np.float32)  # 4 kernels
    got = np.asarray(fft_convolve2d(jnp.asarray(x), ks))
    assert got.shape == (4, 3, 8, 16)
    for i in range(4):
        for b in range(3):
            want = circ_conv2d(x[b].astype(np.float64), ks[i].astype(np.float64))
            np.testing.assert_allclose(got[i, b], want, atol=1e-3)


def test_matrix_convolution():
    rng = np.random.default_rng(2)
    x = rng.random((3, 8, 8)).astype(np.float32)
    k = rng.random((2, 3, 8, 8)).astype(np.float32)  # 2x3 matrix conv
    got = np.asarray(fft_matrix_convolve2d(jnp.asarray(x), jnp.asarray(k)))
    assert got.shape == (2, 8, 8)
    for o in range(2):
        want = sum(
            circ_conv2d(x[i].astype(np.float64), k[o, i].astype(np.float64))
            for i in range(3)
        )
        np.testing.assert_allclose(got[o], want, atol=1e-3)


def test_gaussian_kernel_mass_and_blur():
    k = gaussian_kernel(32, 32, 2.0)
    assert abs(k.sum() - 1.0) < 1e-5
    rng = np.random.default_rng(3)
    x = rng.random((32, 32)).astype(np.float32)
    y = np.asarray(fft_convolve2d(jnp.asarray(x), k))
    assert y.std() < x.std()  # blurred
    assert abs(y.mean() - x.mean()) < 1e-4  # mass preserved


def test_engine_routing_and_fallback():
    from vkresample_tpu.ops.convolve import _engine_ok, kernel_spectrum

    assert _engine_ok(16, 24) and _engine_ok(2048, 4096) and _engine_ok(128)
    assert not _engine_ok(131)  # non-7-smooth prime
    assert not _engine_ok(17)  # small prime outside the radix set
    rng = np.random.default_rng(5)
    # non-smooth size: auto falls back to XLA and still matches direct
    x = rng.random((131, 8))
    k = np.zeros((131, 8))
    k[0, 0], k[1, 0], k[130, 7] = 0.6, 0.3, 0.1
    got = np.asarray(fft_convolve2d(jnp.asarray(x, jnp.float32), k.astype(np.float32)))
    np.testing.assert_allclose(got, circ_conv2d(x, k), atol=1e-4)
    eng, _ = kernel_spectrum(k.astype(np.float32))
    assert eng == "xla"
    with pytest.raises(ValueError):
        fft_convolve2d(jnp.asarray(x, jnp.float32), k.astype(np.float32), engine="mxu")


def test_engine_mxu_matches_xla():
    rng = np.random.default_rng(6)
    x = rng.random((20, 48)).astype(np.float32)
    k = rng.random((20, 48)).astype(np.float32) / 100
    a = np.asarray(fft_convolve2d(jnp.asarray(x), k, engine="mxu"))
    b = np.asarray(fft_convolve2d(jnp.asarray(x), k, engine="xla"))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_plan_time_kernel_spectrum_reuse():
    from vkresample_tpu.ops.convolve import kernel_spectrum

    rng = np.random.default_rng(7)
    x = rng.random((2, 16, 32)).astype(np.float32)
    k = gaussian_kernel(16, 32, 1.5)
    spec = kernel_spectrum(k, engine="mxu")  # auto prefers xla (perf A/B)
    assert spec[0] == "mxu"
    a = np.asarray(fft_convolve2d(jnp.asarray(x), spec))
    b = np.asarray(fft_convolve2d(jnp.asarray(x), k))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_linear_convolution_spatial_zero_pad():
    """vkFFT spatial zero-pad parity: linear (non-circular) convolution
    matches direct full convolution."""
    from vkresample_tpu.ops.convolve import fft_convolve2d_linear

    rng = np.random.default_rng(8)
    x = rng.random((9, 13)).astype(np.float32)
    k = rng.random((4, 5)).astype(np.float32)
    got = np.asarray(fft_convolve2d_linear(jnp.asarray(x), jnp.asarray(k)))
    assert got.shape == (12, 17)
    want = np.zeros((12, 17))
    for dy in range(4):
        for dx in range(5):
            want[dy : dy + 9, dx : dx + 13] += k[dy, dx] * x
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_linear_convolution_batched():
    from vkresample_tpu.ops.convolve import fft_convolve2d_linear

    rng = np.random.default_rng(9)
    x = rng.random((2, 8, 8)).astype(np.float32)
    k = rng.random((3, 3)).astype(np.float32)
    got = np.asarray(fft_convolve2d_linear(jnp.asarray(x), jnp.asarray(k)))
    assert got.shape == (2, 10, 10)
    for b in range(2):
        want = np.zeros((10, 10))
        for dy in range(3):
            for dx in range(3):
                want[dy : dy + 8, dx : dx + 8] += k[dy, dx] * x[b]
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_separable_kernel_takes_fused_staged_path():
    """Concrete separable kernels (Gaussian) fold into the staged conv
    banks — no spectrum materializes — and match the jnp.fft reference;
    VKRESAMPLE_CONV_SEPARABLE=0 restores the spectrum path with the same
    pixels."""
    import os

    import jax.numpy as jnp

    from vkresample_tpu.ops.convolve import (
        _separable_factors,
        fft_convolve2d,
        gaussian_kernel,
    )

    h, w = 48, 64
    k = gaussian_kernel(h, w, 2.5)
    sep = _separable_factors(k)
    assert sep is not None
    assert np.abs(np.outer(sep[0], sep[1]) - k).max() < 1e-7
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, h, w)).astype(np.float32)
    want = np.real(
        np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(k.astype(np.float64)))
    )
    got = np.asarray(fft_convolve2d(jnp.asarray(x), k))
    assert np.abs(got - want).max() < 1e-5
    os.environ["VKRESAMPLE_CONV_SEPARABLE"] = "0"
    try:
        got2 = np.asarray(fft_convolve2d(jnp.asarray(x), k))
    finally:
        del os.environ["VKRESAMPLE_CONV_SEPARABLE"]
    assert np.abs(got2 - want).max() < 1e-5
    # non-separable kernels are untouched by the detection
    k2 = np.zeros((h, w), np.float32)
    k2[0, 0] = 1.0
    k2[3, 5] = 0.5
    k2[5, 3] = 0.25
    assert _separable_factors(k2) is None


def test_integer_kernel_convolves_and_probe_is_svd_free():
    """Review findings (round 3): integer-dtype kernels must not crash
    the separability probe (np.finfo rejects int dtypes), and an exact
    integer box kernel IS separable — it should take the fused path and
    still match the spectrum reference."""
    import jax.numpy as jnp

    from vkresample_tpu.ops.convolve import _separable_factors, fft_convolve2d

    h, w = 32, 48
    k = np.ones((h, w), np.int32)
    sep = _separable_factors(k)
    assert sep is not None
    rng = np.random.default_rng(5)
    x = rng.standard_normal((h, w)).astype(np.float32)
    want = np.real(
        np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(k.astype(np.float64)))
    )
    got = np.asarray(fft_convolve2d(jnp.asarray(x), k))
    assert np.abs(got - want).max() < 1e-3 * np.abs(want).max()
    # the zero kernel is outer(0, 0): separable, convolves to zero
    kz = np.zeros((h, w), np.float32)
    assert _separable_factors(kz) is not None
    assert np.abs(np.asarray(fft_convolve2d(jnp.asarray(x), kz))).max() == 0.0


def test_explicit_mxu_engine_keeps_spectrum_path():
    """engine="mxu" is a contract (the mxu-vs-xla parity surface): a
    separable kernel must NOT silently reroute it onto the fused staged
    path, and the documented non-smooth-size error must keep firing."""
    import jax.numpy as jnp
    import pytest

    from vkresample_tpu.ops import convolve as conv_mod

    h, w = 32, 48
    k = conv_mod.gaussian_kernel(h, w, 2.0)
    x = np.random.default_rng(7).standard_normal((h, w)).astype(np.float32)

    def boom(*a, **kw):
        raise AssertionError("separable path taken for engine='mxu'")

    orig = conv_mod._separable_conv
    conv_mod._separable_conv = boom
    try:
        got = np.asarray(conv_mod.fft_convolve2d(jnp.asarray(x), k, engine="mxu"))
    finally:
        conv_mod._separable_conv = orig
    want = np.real(
        np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(k.astype(np.float64)))
    )
    assert np.abs(got - want).max() < 1e-5
    # non-7-smooth size must still raise for the explicit mxu engine,
    # separable kernel or not (31 is prime > 7)
    k31 = conv_mod.gaussian_kernel(31, w, 2.0)
    x31 = np.random.default_rng(9).standard_normal((31, w)).astype(np.float32)
    with pytest.raises(ValueError, match="radix"):
        conv_mod.fft_convolve2d(jnp.asarray(x31), k31, engine="mxu")
