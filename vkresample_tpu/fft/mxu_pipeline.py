"""MXU-tier upscale core: matmul FFTs + phase-decomposed zero-pad inverse.

This is the hot path for integer upscale factors on 7-smooth even-sized
frames (the reference's headline configuration).  The whole per-frame
pipeline is MXU contractions and VPU elementwise ops; the big spectrum is
never materialized and zero bins are never computed — the TPU-native
equivalent of VkFFT's frequency zero-padding guards (vkFFT.h:1277-1470).

Scaling contract: irfft2_phases/ifft2_phases_c2c return values already in
CAS units (the u^2 inverse-renormalization of VkResample.cpp:1615 is folded
into the source-size transforms), so CAS is applied without a pre-multiply.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.plan import UpscalePlan
from ..ops import cas as cas_ops
from .rfft2 import (
    fft2_c2c,
    ifft2_big_c2c,
    ifft2_phases_c2c,
    irfft2_big,
    irfft2_phases,
    rfft2_packed,
)


def _assemble_pair(F, plan):
    """assemble_big_spectrum over a (re, im) pair."""
    from ..ops.spectrum import assemble_big_spectrum

    return assemble_big_spectrum(F[0], plan), assemble_big_spectrum(F[1], plan)


def upscale_core_mxu(x: jnp.ndarray, plan: UpscalePlan) -> jnp.ndarray:
    """(..., h, w) float -> (..., H, W) float (pre-quantization)."""
    mode = plan.mxu_mode
    if mode is None:
        raise ValueError(
            f"plan not MXU-executable (u={plan.upscale}, "
            f"{plan.h}x{plan.w} -> {plan.H}x{plan.W}); use Engine.XLA"
        )
    u2 = jnp.asarray(float(np.float32(plan.upscale)) ** 2, x.dtype)

    if plan.r2c:
        F = rfft2_packed(x)
        if mode == "phases":
            # phase inverse folds the u^2 renormalization in — no prescale
            out = irfft2_phases(
                F, plan.h, plan.w, plan.integer_upscale, plan.kept_hi_x > 0
            )
        else:  # fractional factor: big spectrum materialized, MXU FFTs
            G = _assemble_pair(F, plan)
            out = u2 * irfft2_big(G, plan.H, plan.W)
        return cas_ops.cas_sharpen(out, plan.sharpen)

    zeros = jnp.zeros_like(x)
    F = fft2_c2c((x, zeros))
    if mode == "phases":
        yr, yi = ifft2_phases_c2c(F, plan.h, plan.w, plan.integer_upscale)
    else:
        G = _assemble_pair(F, plan)
        yr, yi = ifft2_big_c2c(G)
        yr, yi = u2 * yr, u2 * yi
    # c2c CAS consumes the complex magnitude (VkResample.cpp:904)
    mag = jnp.sqrt(yr * yr + yi * yi)
    return cas_ops.cas_sharpen(mag, plan.sharpen)
