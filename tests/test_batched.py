"""Batched pipeline: vmapped program, dp-mesh sharding on the virtual
8-device mesh, planar output variant."""
import jax
import numpy as np
import pytest

from conftest import make_test_image
from vkresample_tpu import Engine, UpscalePlan
from vkresample_tpu.oracle import numpy_ref as oracle
from vkresample_tpu.parallel.mesh import data_parallel_mesh, frames_sharding
from vkresample_tpu.pipeline.batched import build_batched_upscale, upscale_batch


def _frames(n, h, w):
    return np.stack([make_test_image(h, w, 3, seed=60 + i) for i in range(n)])


def test_batched_matches_oracle_no_mesh():
    frames = _frames(3, 32, 64)
    plan = UpscalePlan(h=32, w=64, upscale=2.0, engine=Engine.MXU)
    out = np.asarray(upscale_batch(frames, plan))
    assert out.shape == (3, 64, 128, 3)
    for i in range(3):
        want = oracle.upscale_oracle(frames[i], plan)
        assert np.abs(out[i].astype(int) - want.astype(int)).max() <= 1


def test_batched_sharded_over_mesh():
    n_dev = len(jax.devices())
    frames = _frames(n_dev * 2, 32, 48)
    plan = UpscalePlan(h=32, w=48, upscale=2.0, engine=Engine.MXU)
    mesh = data_parallel_mesh()
    fn = build_batched_upscale(plan, mesh)
    out = fn(frames)
    # output stays sharded over dp
    assert out.sharding.is_equivalent_to(frames_sharding(mesh), out.ndim)
    out = np.asarray(out)
    for i in range(len(frames)):
        want = oracle.upscale_oracle(frames[i], plan)
        assert np.abs(out[i].astype(int) - want.astype(int)).max() <= 1


def test_batched_planar_output():
    frames = _frames(2, 32, 64)
    plan = UpscalePlan(h=32, w=64, upscale=2.0, engine=Engine.MXU)
    fn = build_batched_upscale(plan, None, planar_out=True)
    out = np.asarray(fn(frames))
    assert out.shape == (2, 3, 64, 128)
    want = oracle.upscale_oracle(frames[0], plan)
    assert np.abs(out[0].astype(int) - np.moveaxis(want, -1, 0).astype(int)).max() <= 1


def test_batched_rejects_bad_input():
    plan = UpscalePlan(h=8, w=8, upscale=2.0)
    with pytest.raises(TypeError):
        upscale_batch(np.zeros((4, 8, 8, 3), np.float32), plan)


def test_batched_planes_out_sharded():
    """planes_out over the dp mesh: tuple outputs shard with the prefix
    sharding (each plane sharded on the batch axis)."""
    import jax
    from jax.sharding import Mesh

    from vkresample_tpu.core.config import Engine, Precision
    from vkresample_tpu.core.plan import UpscalePlan
    from vkresample_tpu.pipeline.batched import build_batched_upscale

    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), axis_names=("dp",))
    plan = UpscalePlan(h=32, w=64, upscale=2.0, precision=Precision.HALF,
                       engine=Engine.MXU)
    fn = build_batched_upscale(plan, mesh, planar_out=True, planes_out=True)
    imgs = np.random.default_rng(70).integers(
        0, 256, (2 * n, 32, 64, 3), np.uint8
    )
    planes = fn(imgs)
    assert isinstance(planes, tuple) and len(planes) in (2, 4)
    woven_fn = build_batched_upscale(plan, mesh, planar_out=True)
    woven = np.asarray(woven_fn(imgs))
    if len(planes) == 2:
        np.testing.assert_array_equal(np.asarray(planes[0]), woven[:, :, 0::2, :])
        np.testing.assert_array_equal(np.asarray(planes[1]), woven[:, :, 1::2, :])


def test_batched_c2c_grid_planes_sharded():
    """c2c grid planes over the dp mesh: the p^2-plane tuple shards on
    the batch axis and weaves back to the oracle result."""
    import jax
    from jax.sharding import Mesh

    from vkresample_tpu.core.config import Engine, Precision
    from vkresample_tpu.core.plan import UpscalePlan
    from vkresample_tpu.oracle import numpy_ref as oracle
    from vkresample_tpu.pipeline.batched import build_batched_upscale

    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), axis_names=("dp",))
    plan = UpscalePlan(h=32, w=128, upscale=2.0, r2c=False,
                       precision=Precision.HALF, engine=Engine.MXU)
    woven_fn = build_batched_upscale(plan, mesh, planar_out=True)
    imgs = np.random.default_rng(71).integers(
        0, 256, (2 * n, 32, 128, 3), np.uint8
    )
    woven = np.asarray(woven_fn(imgs))
    want = oracle.upscale_oracle(imgs[0], plan)
    assert np.abs(
        np.moveaxis(woven[0], 0, -1).astype(int) - want.astype(int)
    ).max() <= 1
