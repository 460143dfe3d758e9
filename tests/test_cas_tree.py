"""Integer extremes-tree variants of the quad CAS kernel vs the f32 tree.

The integer trees make bit-identical min/max selections (clip bound
16384 = 1.0 exactly; all sums exact), so outputs must match the
f32-tree kernel bit-for-bit.  'i16' is the 2x-lane cmp+select form
(does not lower on v5e, kept for future backends); 'i32' runs native
integer min/max on sign-extended codes (round 5, verdict item 7)."""
import numpy as np
import pytest
from jax import numpy as jnp

from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2


@pytest.mark.parametrize("tree", ["i16", "i32"])
@pytest.mark.parametrize("seed", [0, 1])
def test_quad_int_tree_matches_f32_tree(monkeypatch, seed, tree):
    rng = np.random.default_rng(seed)
    h, wh = 128, 128
    planes = [
        jnp.asarray(
            rng.integers(-18000, 18000, (2, h, wh)).astype(np.int16)
        )
        for _ in range(4)
    ]
    base = cas_parity4_planes_u2(
        *planes, 0.2, block_rows=32, interpret=True
    )
    monkeypatch.setenv("VKRESAMPLE_CAS_TREE", tree)
    got = cas_parity4_planes_u2(
        *planes, 0.2, block_rows=32, interpret=True
    )
    for a, b in zip(base, got):
        # the integer trees make bit-identical min/max selections and
        # every convert is exact, but the compiler may contract the
        # blend's c + sc*nsum to an FMA in one lowering and not the
        # other — a 1-ulp shift that moves quantization-boundary pixels
        # by 1 LSB (verified: the blend INPUTS agree to the bit)
        d = np.abs(
            np.asarray(a).astype(int) - np.asarray(b).astype(int)
        ).max()
        assert d <= 1, d


def test_quad_i32_tree_int16_min_code(monkeypatch):
    """-32768 sign-extends cleanly in the i32 tree (no wrap; the i16
    form needs the -32767 pre-clamp) — both still clip to 16384."""
    vals = np.full((2, 128, 128), -32768, np.int16)
    vals[:, 5:9, 3:70] = 11111
    planes = [jnp.asarray(vals) for _ in range(4)]
    base = cas_parity4_planes_u2(*planes, 0.2, block_rows=32, interpret=True)
    monkeypatch.setenv("VKRESAMPLE_CAS_TREE", "i32")
    got = cas_parity4_planes_u2(*planes, 0.2, block_rows=32, interpret=True)
    for a, b in zip(base, got):
        d = np.abs(
            np.asarray(a).astype(int) - np.asarray(b).astype(int)
        ).max()
        assert d <= 1, d
