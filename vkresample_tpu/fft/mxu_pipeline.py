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

from ..core.plan import UpscalePlan
from ..ops import cas as cas_ops
from .rfft2 import fft2_c2c, ifft2_phases_c2c, irfft2_phases, rfft2_packed


def upscale_core_mxu(x: jnp.ndarray, plan: UpscalePlan) -> jnp.ndarray:
    """(..., h, w) float -> (..., H, W) float (pre-quantization)."""
    u = plan.integer_upscale
    if u is None or plan.h % 2 or plan.w % 2:
        raise ValueError(
            "MXU tier requires an integer upscale factor and even source "
            f"dims; got u={plan.upscale}, {plan.h}x{plan.w} "
            "(use Engine.XLA / AUTO for fractional factors)"
        )
    if plan.r2c:
        F = rfft2_packed(x)
        keep_nyquist = plan.kept_hi_x > 0  # only at u == 1
        out = irfft2_phases(F, plan.h, plan.w, u, keep_nyquist)
        return cas_ops.cas_sharpen(out, plan.sharpen)
    zeros = jnp.zeros_like(x)
    F = fft2_c2c((x, zeros))
    yr, yi = ifft2_phases_c2c(F, plan.h, plan.w, u)
    # c2c CAS consumes the complex magnitude (VkResample.cpp:904)
    mag = jnp.sqrt(yr * yr + yi * yi)
    return cas_ops.cas_sharpen(mag, plan.sharpen)
