"""Factored (relayout-free) staged column layout.

The staged x conv's S3 stage can emit its NATURAL matmul order "...de"
(memory col j = d*n2 + e holds plane col s = e*n1 + d), which removes
the transposed-dot relayout XLA pays for the natural "...ed" order
(on-chip probe5: 4-plane 8K transform 14.0-16.6 vs 19.6-19.9 ms).  The
y convs treat columns as a pure batch dim, and the quad CAS kernels
decode neighbors in the factored geometry (west/east = +-n2 memory
columns with lane-shifted wrap slabs at the d-boundaries).
Reference bar: the 4-step inter-pass layout freedom of
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
        (64, 256, 2, 128, jnp.int16),  # full-width slots path
        (64, 8192, 64, 128, jnp.int16),  # column-strip slots path (> wmax)
        (64, 256, 2, 128, jnp.float32),
        (32, 384, 3, 128, jnp.int16),  # odd n1 (wrap parity)
    ],
)
def test_factored_cas_bit_exact(h, Wh, n1, n2, dt):
    """The factored-geometry quad CAS kernel computes the exact same
    values as the natural kernel on the permuted planes."""
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


@pytest.mark.parametrize("dt", [jnp.int16, jnp.float32])
def test_factored_cas_strips_narrow_window(monkeypatch, dt):
    """Wsb == chalo (= n2): window ss=1 also lands at ws == 0, so TWO
    windows carry ds == 0 — pins the static head/tail wrap select (the
    wrap value at a halo slab must stay harmless) against the natural
    kernel at the narrowest legal strip."""
    monkeypatch.setenv("VKRESAMPLE_QUAD_WSB", "128")
    monkeypatch.setenv("VKRESAMPLE_QUAD_BT", "32")
    h, Wh, n1, n2 = 64, 8192, 64, 128
    rng = np.random.default_rng(4)
    nat = [
        (rng.random((1, h, Wh)) * 2 - 0.5).astype(np.float32)
        for _ in range(4)
    ]
    if dt == jnp.int16:
        nat = [
            np.clip(np.round(x * 16384), -32767, 32767).astype(np.int16)
            for x in nat
        ]
    nat = [jnp.asarray(x) for x in nat]
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


def test_factored_cas_unsupported_geometry_falls_back():
    """n2 not a lane multiple: the wrapper must decode->natural->encode
    and still return factored-layout planes."""
    h, Wh, n1, n2 = 64, 256, 4, 64
    rng = np.random.default_rng(2)
    nat = [
        jnp.asarray(
            np.clip(
                np.round((rng.random((3, h, Wh)) * 2 - 0.5) * 16384),
                -32767,
                32767,
            ).astype(np.int16)
        )
        for _ in range(4)
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


@pytest.mark.parametrize(
    "bt,wsb",
    [(128, 1024), (32, 2048), (64, 1024)],
)
def test_factored_cas_strips_tpu_lowering(monkeypatch, bt, wsb):
    """Cross-lower the factored strips kernel for TPU on CPU.  Mosaic
    lowering runs client-side, so this catches unimplemented-primitive
    breaks (value dynamic_slice, scalar select_n) that interpret-mode
    tests cannot — the round-3 head/tail-select form shipped green on
    interpret and failed exactly here on chip."""
    monkeypatch.setenv("VKRESAMPLE_QUAD_WSB", str(wsb))
    monkeypatch.setenv("VKRESAMPLE_QUAD_BT", str(bt))
    h, Wh, n1, n2 = 512, 8192, 64, 128
    rng = np.random.default_rng(7)
    fac = [
        jnp.asarray(rng.integers(-8000, 8000, (1, h, Wh), np.int16))
        for _ in range(4)
    ]

    def f(p0, rest):
        return cas_pallas.cas_parity4_planes_u2(
            p0, *rest, 0.2, fac_split=(n1, n2)
        )

    import jax

    jax.jit(f).trace(fac[0], fac[1:]).lower(lowering_platforms=("tpu",))
