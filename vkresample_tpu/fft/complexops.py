"""Complex arithmetic over explicit (re, im) float pairs.

TPU compute units operate on real tiles; representing complex tensors as
two real arrays lets every complex matmul lower to real MXU matmuls (3 per
complex product via Karatsuba with precomputed matrix sums) and keeps
layouts fully under our control — the TPU analog of VkFFT generating
scalar-pair arithmetic in its shaders (vkFFT.h:731-1182 butterflies).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

CPair = Tuple[jnp.ndarray, jnp.ndarray]


def cmul(a: CPair, b: CPair) -> CPair:
    """Elementwise complex multiply (4 real mults — VPU, cheap)."""
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def cconj(a: CPair) -> CPair:
    return a[0], -a[1]


def cadd(a: CPair, b: CPair) -> CPair:
    return a[0] + b[0], a[1] + b[1]


def csub(a: CPair, b: CPair) -> CPair:
    return a[0] - b[0], a[1] - b[1]


def cscale(a: CPair, s) -> CPair:
    return a[0] * s, a[1] * s


def to_pair(z: jnp.ndarray) -> CPair:
    return jnp.real(z), jnp.imag(z)


def to_complex(a: CPair) -> jnp.ndarray:
    import jax.lax

    return jax.lax.complex(a[0], a[1])
