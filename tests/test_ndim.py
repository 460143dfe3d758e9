"""N-D FFT surface (engine capability parity: VkFFT FFTdim 1-3) vs numpy."""
import numpy as np
from jax import numpy as jnp

from vkresample_tpu.fft.ndim import fftn, irfftn, rfftn


def _cp(z):
    return jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32)


def _np(p):
    return np.asarray(p[0]) + 1j * np.asarray(p[1])


def test_fft3d_vs_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 10, 16)) + 1j * rng.normal(size=(2, 12, 10, 16))
    got = _np(fftn(_cp(x), axes=(-3, -2, -1)))
    want = np.fft.fftn(x, axes=(-3, -2, -1))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_ifft3d_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 8, 10)) + 1j * rng.normal(size=(6, 8, 10))
    F = fftn(_cp(x), axes=(0, 1, 2))
    back = _np(fftn(F, axes=(0, 1, 2), inverse=True))
    assert np.max(np.abs(back - x)) < 1e-4


def test_rfftn_irfftn_roundtrip_3d():
    rng = np.random.default_rng(2)
    x = rng.random((4, 8, 12)).astype(np.float32)
    F = rfftn(jnp.asarray(x), axes=(-3, -2, -1))
    want = np.fft.rfftn(x, axes=(-3, -2, -1))
    got = _np(F)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5
    back = np.asarray(irfftn(F, s=x.shape, axes=(-3, -2, -1)))
    assert np.max(np.abs(back - x)) < 1e-5


def test_rfftn_irfftn_roundtrip_odd_last_axis():
    """Odd w has no Nyquist bin — every shape-parity combination of the
    penultimate dim must round-trip (round-1 bug: (4,8,15) raised, (4,7,15)
    silently returned width 14)."""
    rng = np.random.default_rng(5)
    for shape in [(4, 8, 15), (4, 7, 15), (6, 9), (2, 5, 8, 15)]:
        x = rng.random(shape).astype(np.float32)
        axes = tuple(range(-min(3, x.ndim), 0))
        F = rfftn(jnp.asarray(x), axes=axes)
        want = np.fft.rfftn(x, axes=axes)
        got = _np(F)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5, shape
        back = np.asarray(irfftn(F, s=x.shape, axes=axes))
        assert back.shape == x.shape, (shape, back.shape)
        assert np.max(np.abs(back - x)) < 1e-5, shape


def test_fft1d_axis0():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(24, 5)) + 1j * rng.normal(size=(24, 5))
    got = _np(fftn(_cp(x), axes=(0,)))
    want = np.fft.fft(x, axis=0)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5
