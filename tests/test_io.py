"""PNG I/O tests: native codec vs PIL roundtrips, batched pool, folder
protocol (reference: stb_image decode VkResample.cpp:1362, %06d.png naming
1357)."""
import os

import numpy as np
import pytest

from conftest import make_test_image
from vkresample_tpu.io import folder, png


def test_frame_paths():
    assert folder.frame_path("inp/img", 1) == "inp/img/000001.png"
    assert folder.frame_paths("x", 3) == [
        "x/000001.png",
        "x/000002.png",
        "x/000003.png",
    ]


def test_roundtrip(tmp_path):
    img = make_test_image(37, 53, 3, seed=5)
    p = str(tmp_path / "t.png")
    png.write_png(p, img)
    back = png.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_native_available_and_matches_pil(tmp_path):
    if not png.native_available():
        pytest.skip("native codec unavailable")
    from PIL import Image

    img = make_test_image(24, 31, 3, seed=6)
    p = str(tmp_path / "n.png")
    png.write_png(p, img)  # native encode
    via_pil = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(via_pil, img)
    # PIL encode -> native decode
    p2 = str(tmp_path / "p.png")
    Image.fromarray(img, "RGB").save(p2)
    np.testing.assert_array_equal(png.read_png(p2), img)


def test_decode_rgba_and_gray(tmp_path):
    from PIL import Image

    img = make_test_image(16, 20, 3, seed=7)
    rgba = np.concatenate([img, np.full((16, 20, 1), 255, np.uint8)], -1)
    p = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, "RGBA").save(p)
    np.testing.assert_array_equal(png.read_png(p), img)

    gray = img[:, :, 0]
    p2 = str(tmp_path / "gray.png")
    Image.fromarray(gray, "L").save(p2)
    got = png.read_png(p2)
    assert got.shape == (16, 20, 3)
    np.testing.assert_array_equal(got[:, :, 0], gray)
    np.testing.assert_array_equal(got[:, :, 1], gray)


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        png.read_png("/nonexistent/nope.png")


def test_pool_batch_roundtrip(tmp_path):
    n, h, w = 6, 18, 26
    frames = np.stack([make_test_image(h, w, 3, seed=i) for i in range(n)])
    paths = [str(tmp_path / f"{i:06d}.png") for i in range(n)]
    with png.PngPool(num_threads=3) as pool:
        pool.encode_batch(paths, frames)
        back = pool.decode_batch(paths, w, h)
    np.testing.assert_array_equal(back, frames)


def test_pool_size_mismatch(tmp_path):
    img = make_test_image(10, 12, 3, seed=9)
    p = str(tmp_path / "a.png")
    png.write_png(p, img)
    with png.PngPool(1) as pool:
        with pytest.raises(ValueError):
            pool.decode_batch([p], 99, 99)


def test_pool_planar_encode_roundtrip(tmp_path):
    n, h, w = 4, 20, 24
    frames = np.stack([make_test_image(h, w, 3, seed=50 + i) for i in range(n)])
    planar = np.moveaxis(frames, -1, 1).copy()  # (N, 3, H, W)
    paths = [str(tmp_path / f"p{i:06d}.png") for i in range(n)]
    with png.PngPool(num_threads=2) as pool:
        pool.encode_batch_planar(paths, planar)
        back = pool.decode_batch(paths, w, h)
    np.testing.assert_array_equal(back, frames)


def test_write_png_planar_single(tmp_path):
    img = make_test_image(20, 28, 3, seed=77)
    p = str(tmp_path / "planar.png")
    png.write_png_planar(p, np.moveaxis(img, -1, 0).copy())
    np.testing.assert_array_equal(png.read_png(p), img)


def test_write_png_planar_parity_roundtrip(tmp_path):
    from vkresample_tpu.io.png import read_png, write_png_planar_parity

    rng = np.random.default_rng(50)
    img = rng.integers(0, 256, (3, 64, 48), np.uint8)  # (C, H, W)
    e = img[:, 0::2, :].copy()
    d = img[:, 1::2, :].copy()
    p = str(tmp_path / "parity.png")
    write_png_planar_parity(p, e, d)
    got = read_png(p)
    np.testing.assert_array_equal(got, np.moveaxis(img, 0, -1))


def test_pool_encode_batch_planar_parity(tmp_path):
    from vkresample_tpu.io.png import PngPool, read_png

    rng = np.random.default_rng(51)
    imgs = rng.integers(0, 256, (3, 3, 32, 64), np.uint8)  # (N, C, H, W)
    e = np.ascontiguousarray(imgs[:, :, 0::2, :])
    d = np.ascontiguousarray(imgs[:, :, 1::2, :])
    paths = [str(tmp_path / f"{i:06d}.png") for i in range(3)]
    with PngPool(2) as pool:
        pool.encode_batch_planar_parity(paths, e, d)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(read_png(p), np.moveaxis(imgs[i], 0, -1))


def test_write_png_planar_parity4_roundtrip(tmp_path):
    from vkresample_tpu.io.png import read_png, write_png_planar_parity4

    rng = np.random.default_rng(52)
    img = rng.integers(0, 256, (3, 64, 48), np.uint8)  # (C, H, W)
    ps = [img[:, ry::2, rx::2].copy() for ry in (0, 1) for rx in (0, 1)]
    # order: p00, p01, p10, p11
    ps = [img[:, 0::2, 0::2], img[:, 0::2, 1::2], img[:, 1::2, 0::2], img[:, 1::2, 1::2]]
    p = str(tmp_path / "parity4.png")
    write_png_planar_parity4(p, ps)
    got = read_png(p)
    np.testing.assert_array_equal(got, np.moveaxis(img, 0, -1))


def test_pool_encode_batch_planar_parity4(tmp_path):
    from vkresample_tpu.io.png import PngPool, read_png

    rng = np.random.default_rng(53)
    imgs = rng.integers(0, 256, (3, 3, 32, 64), np.uint8)  # (N, C, H, W)
    ps = [
        np.ascontiguousarray(imgs[:, :, ry::2, rx::2])
        for ry in (0, 1)
        for rx in (0, 1)
    ]
    paths = [str(tmp_path / f"{i:06d}.png") for i in range(3)]
    with PngPool(2) as pool:
        pool.encode_batch_planar_parity4(paths, ps)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(read_png(p), np.moveaxis(imgs[i], 0, -1))
