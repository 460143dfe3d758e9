"""Factored (relayout-free) staged column layout — REJECTED route.

The staged x conv's S3 stage can emit its NATURAL matmul order "...de"
(memory col j = d*n2 + e holds plane col s = e*n1 + d), which removes
the transposed-dot relayout XLA pays for the natural "...ed" order.
probe5 measured the bare 4-plane transform winning on-chip (14.0-16.6
vs 19.6-19.9 ms at 8K), but the PRODUCTION form (correction terms +
int32 colsum in the same program) LOSES: transform 25.5 vs 22.3 ms and
e2e 42.7 vs 31.0 (scripts/fac_decide_ab.py, 4 interleaved passes), and
the factored CAS geometry pays ~7 ms over the natural kernel for its
n2-wide column halo + d-boundary wrap slabs (16.7-17.4 vs 9.6-10.1 ms,
scripts/factored_cas_sweep.py).  Round 4 pruned the in-kernel factored
CAS geometry; the transform capability and the decode->natural->encode
CAS fallback remain for library callers, pinned here.
Reference bar considered: the 4-step inter-pass layout freedom of
/root/reference/vkFFT/vkFFT.h:2205-2389 (reorderFourStep).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import staged
from vkresample_tpu.ops import cas_pallas


def test_scramble_defactor_roundtrip():
    for n1, n2 in ((2, 128), (16, 16), (3, 128), (64, 128)):
        v = jnp.arange(n1 * n2)
        s = staged.scramble_cols(v, n1, n2)
        assert (staged.defactor_cols(s, n1, n2) == v).all()
        # explicit index law: scrambled[d*n2+e] == natural[e*n1+d]
        d, e = 1, min(2, n2 - 1)
        assert int(s[d * n2 + e]) == e * n1 + d


def test_factored_transform_matches_natural():
    """factored=True is a pure output permutation of the staged quad
    transform (same einsum contractions -> bit-identical values)."""
    h, w = 96, 256
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    banks = {
        k: jnp.asarray(v) for k, v in staged.r2c_quad_staged_banks(plan).items()
    }
    n1, n2 = staged.factored_split(banks)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (3, h, w), np.uint8))
    prec = jax.lax.Precision.HIGHEST
    nat = staged.r2c_quad_staged(x, banks, prec)
    fac = staged.r2c_quad_staged(x, banks, prec, factored=True)
    for a, b in zip(nat, fac):
        assert jnp.abs(a - staged.defactor_cols(b, n1, n2)).max() == 0


@pytest.mark.parametrize(
    "h,Wh,n1,n2,dt",
    [
        (64, 256, 2, 128, jnp.int16),
        (64, 256, 2, 128, jnp.float32),
        (64, 256, 4, 64, jnp.int16),  # n2 not a lane multiple
    ],
)
def test_factored_cas_fallback_bit_exact(h, Wh, n1, n2, dt):
    """fac_split planes decode to natural, run the natural kernel, and
    re-encode — bit-identical to the natural kernel on permuted data."""
    rng = np.random.default_rng(1)
    nat = [
        jnp.asarray((rng.random((3, h, Wh)) * 2 - 0.5).astype(np.float32))
        for _ in range(4)
    ]
    if dt == jnp.int16:
        nat = [
            jnp.asarray(
                np.clip(np.round(np.asarray(x) * 16384), -32767, 32767).astype(
                    np.int16
                )
            )
            for x in nat
        ]
    fac = [staged.scramble_cols(x, n1, n2) for x in nat]
    o_nat = cas_pallas.cas_parity4_planes_u2(*nat, 0.2, interpret=True)
    o_fac = cas_pallas.cas_parity4_planes_u2(
        *fac, 0.2, interpret=True, fac_split=(n1, n2)
    )
    for a, b in zip(o_nat, o_fac):
        bd = staged.defactor_cols(b, n1, n2)
        assert int(
            np.abs(np.asarray(bd, np.int32) - np.asarray(a, np.int32)).max()
        ) == 0


def test_factored_e2e_vs_oracle():
    """Full factored chain (transform -> i16 codec -> factored CAS) vs the
    fp64 oracle at <= 1 u8 LSB, matching the natural staged gate."""
    from vkresample_tpu.ops import cas as cas_ops
    from vkresample_tpu.oracle import numpy_ref as oracle

    h, w = 64, 256
    plan = UpscalePlan(
        h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU
    )
    banks = {
        k: jnp.asarray(v) for k, v in staged.r2c_quad_staged_banks(plan).items()
    }
    n1, n2 = staged.factored_split(banks)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    x = jnp.asarray(np.moveaxis(img, -1, 0))
    Ps = staged.r2c_quad_staged(
        x,
        banks,
        staged.staged_precision(),
        store=cas_ops.to_i16_storage,
        load=cas_ops.from_i16_storage,
        factored=True,
    )
    Pu8 = cas_pallas.cas_parity4_planes_u2(
        *Ps, plan.sharpen, interpret=True, fac_split=(n1, n2)
    )
    nat = [np.asarray(staged.defactor_cols(p, n1, n2)) for p in Pu8]
    out = np.empty((3, 2 * h, 2 * w), np.uint8)
    out[:, 0::2, 0::2] = nat[0]
    out[:, 0::2, 1::2] = nat[1]
    out[:, 1::2, 0::2] = nat[2]
    out[:, 1::2, 1::2] = nat[3]
    ref = oracle.upscale_oracle(img, plan)
    got = np.moveaxis(out, 0, -1)
    assert int(np.abs(got.astype(np.int32) - ref.astype(np.int32)).max()) <= 1
