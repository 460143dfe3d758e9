"""N-dimensional FFT on the mixed-radix MXU engine.

The reference engine supports 1-3D transforms (VkFFTConfiguration.FFTdim,
vkFFT.h:23; axis sequencing in VkFFTAppend 7631-8292).  VkResample only
uses 2D, but the capability is part of the engine surface: this module
generalizes the axis kernels to arbitrary rank, including real transforms.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from .complexops import CPair
from .mixed_radix import fft


def fftn(
    x: CPair,
    axes: Sequence[int] = (-2, -1),
    inverse: bool = False,
    normalize: bool | None = None,
    max_factor: int = 128,
) -> CPair:
    """Complex N-D FFT of a (re, im) pair over `axes`.

    Forward unnormalized; inverse normalized by 1/N per axis (VkFFT
    convention, normalize=1) unless overridden.
    """
    if normalize is None:
        normalize = inverse
    xr, xi = x
    nd = xr.ndim
    for ax in axes:
        a = ax % nd
        if a >= nd - 2:
            xr, xi = fft(
                (xr, xi),
                axis=a - nd,
                inverse=inverse,
                normalize=normalize,
                max_factor=max_factor,
            )
        else:
            xr = jnp.moveaxis(xr, a, -1)
            xi = jnp.moveaxis(xi, a, -1)
            xr, xi = fft(
                (xr, xi),
                axis=-1,
                inverse=inverse,
                normalize=normalize,
                max_factor=max_factor,
            )
            xr = jnp.moveaxis(xr, -1, a)
            xi = jnp.moveaxis(xi, -1, a)
    return xr, xi


def rfftn(
    x: jnp.ndarray, axes: Sequence[int] = (-2, -1), max_factor: int = 128
) -> CPair:
    """Real N-D forward FFT: R2C along the last of `axes`, complex along
    the rest.  Returns the half spectrum over the final axis."""
    last = axes[-1]
    nd = x.ndim
    a = last % nd
    if a != nd - 1:
        raise ValueError("rfftn requires the real axis to be the last axis")
    n = x.shape[-1]
    # R2C via full complex transform of (x, 0) then truncation — the packed
    # fast paths live in rfft2.py; this is the general-rank surface
    Xr, Xi = fft((x, jnp.zeros_like(x)), axis=-1, max_factor=max_factor)
    Xr, Xi = Xr[..., : n // 2 + 1], Xi[..., : n // 2 + 1]
    return fftn((Xr, Xi), axes=axes[:-1], max_factor=max_factor)


def irfftn(
    X: CPair, s: Tuple[int, ...], axes: Sequence[int] = (-2, -1), max_factor: int = 128
) -> jnp.ndarray:
    """Inverse of rfftn (normalized), output shape `s` over `axes`."""
    from .rfft2 import _c2r_rows_packed

    Xr, Xi = fftn(X, axes=axes[:-1], inverse=True, max_factor=max_factor)
    w = s[-1]
    if w % 2 == 0 and Xr.shape[-2] % 2 == 0:
        # fast path: row-pair packing (needs Nyquist bin + even row count)
        return _c2r_rows_packed((Xr, Xi), w, keep_nyquist=True, max_factor=max_factor)
    # general path: per-row Hermitian extension + full complex ifft.
    # Half spectrum holds w//2+1 bins either way; for even w the last bin
    # is the (real) Nyquist, for odd w it is a regular paired bin that
    # mirrors like the rest — odd w has no Nyquist frequency.
    nb = w // 2 + 1
    body_r = Xr[..., :nb]
    body_i = Xi[..., :nb].at[..., 0].set(0.0)
    if w % 2 == 0:
        body_i = body_i.at[..., -1].set(0.0)
        mir_r = jnp.flip(body_r[..., 1:-1], -1)
        mir_i = -jnp.flip(body_i[..., 1:-1], -1)
    else:
        mir_r = jnp.flip(body_r[..., 1:], -1)
        mir_i = -jnp.flip(body_i[..., 1:], -1)
    Er = jnp.concatenate([body_r, mir_r], -1)
    Ei = jnp.concatenate([body_i, mir_i], -1)
    yr, _ = fft((Er, Ei), axis=-1, inverse=True, normalize=True, max_factor=max_factor)
    return yr
