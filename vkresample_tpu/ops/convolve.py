"""Frequency-domain convolution — the VkFFT engine capability surface.

The reference engine supports a convolution step fused between forward and
inverse transforms (vkFFT.h:45-48 config, codegen 3157-3517): elementwise
spectrum multiply, multi-kernel batching (numberKernels), and 2x2/3x3
*matrix* convolution across coordinateFeatures (output feature = sum over
input features of kernel-matrix entries).  VkResample itself never calls
it, but it is part of the engine surface this framework reproduces.

TPU-native formulation: plan-time kernel spectrum (the analog of VkFFT
uploading the kernel and transforming it once), jitted spectrum multiply
between our forward/inverse transforms.  Circular convolution semantics
(FFT-native, as the reference's).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _rfft2(x):
    return jnp.fft.rfft2(x)


def _irfft2(X, s):
    return jnp.fft.irfft2(X, s=s)


def fft_convolve2d(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Circular 2D convolution via the frequency domain.

    x:      (..., h, w) real.
    kernel: (h, w) — one kernel broadcast over leading dims, or
            (K, h, w) — K kernels (VkFFT numberKernels batching): output
            gains a leading K axis.
    """
    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel, x.dtype)
    h, w = x.shape[-2], x.shape[-1]
    X = _rfft2(x)
    if kernel.ndim == 2:
        Kf = _rfft2(kernel)
        return _irfft2(X * Kf, (h, w))
    Kf = _rfft2(kernel)  # (K, h, w2)
    # broadcast kernels against batch: out (K, ..., h, w)
    Y = Kf.reshape(Kf.shape[:1] + (1,) * (X.ndim - 2) + Kf.shape[1:]) * X[None]
    return _irfft2(Y, (h, w))


def fft_matrix_convolve2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Matrix convolution over coordinate features (vkFFT matrixConvolution,
    vkFFT.h:46: 2x2/3x3 supported there; any square size here).

    x:      (..., C, h, w) — C coordinate features.
    kernel: (Cout, Cin, h, w) with Cin == C.
    Returns (..., Cout, h, w): out[o] = sum_i kernel[o, i] (*) x[i].
    """
    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel, x.dtype)
    C = x.shape[-3]
    if kernel.shape[1] != C:
        raise ValueError(f"kernel Cin {kernel.shape[1]} != x features {C}")
    h, w = x.shape[-2], x.shape[-1]
    X = _rfft2(x)  # (..., C, h, w2)
    Kf = _rfft2(kernel)  # (Cout, Cin, h, w2)
    Y = jnp.einsum("oihw,...ihw->...ohw", Kf, X)
    return _irfft2(Y, (h, w))


def gaussian_kernel(h: int, w: int, sigma: float, dtype=np.float32) -> np.ndarray:
    """Centered periodic Gaussian kernel, unit mass — a convenience for the
    convolution surface (blur/AA filters)."""
    y = np.minimum(np.arange(h), h - np.arange(h))[:, None]
    x = np.minimum(np.arange(w), w - np.arange(w))[None, :]
    k = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(dtype)
