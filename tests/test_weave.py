"""u16-packed device-side u8 weaves vs numpy strided assignment."""
import numpy as np
from jax import numpy as jnp

from vkresample_tpu.ops.weave import weave_cols_u8, weave_quad_u8


def test_weave_cols_u8():
    rng = np.random.default_rng(0)
    e = rng.integers(0, 256, (3, 8, 16), np.uint8)
    o = rng.integers(0, 256, (3, 8, 16), np.uint8)
    got = np.asarray(weave_cols_u8(jnp.asarray(e), jnp.asarray(o)))
    want = np.zeros((3, 8, 32), np.uint8)
    want[..., 0::2] = e
    want[..., 1::2] = o
    assert (got == want).all()


def test_weave_quad_u8():
    rng = np.random.default_rng(1)
    ps = [rng.integers(0, 256, (2, 8, 16), np.uint8) for _ in range(4)]
    got = np.asarray(weave_quad_u8(*(jnp.asarray(p) for p in ps)))
    want = np.zeros((2, 16, 32), np.uint8)
    want[:, 0::2, 0::2] = ps[0]
    want[:, 0::2, 1::2] = ps[1]
    want[:, 1::2, 0::2] = ps[2]
    want[:, 1::2, 1::2] = ps[3]
    assert (got == want).all()
