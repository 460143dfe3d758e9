"""int16 extremes-tree variant of the quad CAS kernel vs the f32 tree.

The i16 tree makes bit-identical min/max selections (clip bound 16384 =
1.0 exactly), so outputs must match the f32-tree kernel bit-for-bit."""
import numpy as np
import pytest
from jax import numpy as jnp

from vkresample_tpu.ops.cas_pallas import cas_parity4_planes_u2


@pytest.mark.parametrize("seed", [0, 1])
def test_quad_i16_tree_matches_f32_tree(monkeypatch, seed):
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
    monkeypatch.setenv("VKRESAMPLE_CAS_TREE", "i16")
    got = cas_parity4_planes_u2(
        *planes, 0.2, block_rows=32, interpret=True
    )
    for a, b in zip(base, got):
        # bit-exact: the i16 tree makes the identical min/max selections
        # and every convert is exact
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
