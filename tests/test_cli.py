"""CLI smoke tests: flag parity with the reference (-h, -devices, single
image, batched folder; VkResample.cpp:1795-1977)."""
import os

import numpy as np
import pytest

from conftest import make_test_image
from vkresample_tpu import cli
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.io.png import read_png, write_png
from vkresample_tpu.oracle import numpy_ref as oracle


def test_help(capsys):
    assert cli.main(["-h"]) == 0
    out = capsys.readouterr().out
    for flag in ["-devices", "-u X", "-p X", "-s X", "-n X", "-ifolder", "-numthreads"]:
        assert flag in out


def test_devices(capsys):
    assert cli.main(["-devices"]) == 0
    assert "Device id: 0" in capsys.readouterr().out


def test_parse_defaults():
    cfg, extras = cli._parse(["-i", "x.png"])
    assert cfg.upscale == 1 and cfg.precision is Precision.SINGLE
    assert cfg.num_iter == 1 and cfg.sharpen == 0.2 and cfg.num_threads == 1
    assert not extras["c2c"]


def test_parse_full():
    cfg, extras = cli._parse(
        "-u 2 -p 2 -s 0.1 -n 3 -d 0 -ifolder inp/img -ofolder outp/img "
        "-numfiles 4 -numthreads 2 -engine mxu -c2c".split()
    )
    assert cfg.upscale == 2.0
    assert cfg.precision is Precision.HALF
    assert cfg.sharpen == 0.1
    assert cfg.num_iter == 3
    assert cfg.ifolder_prefix == "inp/img"
    assert cfg.num_files == 4 and cfg.num_threads == 2
    assert cfg.engine is Engine.MXU
    assert extras["c2c"]


def test_parse_missing_input():
    assert cli._parse([]) is None


def test_single_image_end_to_end(tmp_path, capsys):
    img = make_test_image(48, 64, 3, seed=30)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    write_png(inp, img)
    rc = cli.main(["-i", inp, "-o", outp, "-u", "2", "-s", "0.2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2.0x upscale: 64x48 to 128x96" in out
    got = read_png(outp)
    from vkresample_tpu.core.plan import UpscalePlan

    plan = UpscalePlan(h=48, w=64, upscale=2.0)
    want = oracle.upscale_oracle(img, plan)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_single_image_default_output_name(tmp_path, monkeypatch):
    img = make_test_image(32, 32, 3, seed=31)
    inp = str(tmp_path / "in.png")
    write_png(inp, img)
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-i", inp, "-u", "2"])
    assert rc == 0
    # default name: "%d_%d_upscaled.png" (VkResample.cpp:1706)
    assert os.path.exists(str(tmp_path / "32_64_upscaled.png"))


def test_missing_image(tmp_path, capsys):
    rc = cli.main(["-i", str(tmp_path / "nope.png"), "-u", "2"])
    assert rc == 1
    assert "Image not found" in capsys.readouterr().out


def test_batched_folder_mode(tmp_path, capsys):
    n = 5
    ifolder = tmp_path / "inp"
    ofolder = tmp_path / "outp"
    ifolder.mkdir()
    ofolder.mkdir()
    frames = [make_test_image(32, 48, 3, seed=40 + i) for i in range(n)]
    for i, f in enumerate(frames):
        write_png(str(ifolder / f"{i+1:06d}.png"), f)
    rc = cli.main(
        [
            "-ifolder",
            str(ifolder),
            "-ofolder",
            str(ofolder),
            "-numfiles",
            str(n),
            "-numthreads",
            "2",
            "-u",
            "2",
        ]
    )
    assert rc == 0
    from vkresample_tpu.core.plan import UpscalePlan

    plan = UpscalePlan(h=32, w=48, upscale=2.0)
    for i, f in enumerate(frames):
        got = read_png(str(ofolder / f"{i+1:06d}.png"))
        want = oracle.upscale_oracle(f, plan)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, f"frame {i}"


def test_validate_flag(tmp_path, capsys):
    img = make_test_image(32, 64, 3, seed=33)
    inp = str(tmp_path / "v.png")
    write_png(inp, img)
    rc = cli.main(
        ["-i", inp, "-o", str(tmp_path / "vo.png"), "-u", "2", "-validate"]
    )
    out = capsys.readouterr().out
    assert "Validation vs fp64 oracle" in out
    assert rc == 0 and "OK" in out


def test_batched_resume_skips_existing(tmp_path, capsys):
    n = 4
    ifolder = tmp_path / "rin"
    ofolder = tmp_path / "rout"
    ifolder.mkdir()
    ofolder.mkdir()
    for i in range(n):
        write_png(str(ifolder / f"{i+1:06d}.png"), make_test_image(16, 32, 3, seed=i))
    # pre-create outputs 1 and 3
    marker = make_test_image(32, 64, 3, seed=99)
    write_png(str(ofolder / "000001.png"), marker)
    write_png(str(ofolder / "000003.png"), marker)
    rc = cli.main(
        ["-ifolder", str(ifolder), "-ofolder", str(ofolder), "-numfiles", str(n),
         "-u", "2", "-resume"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "skipping 2" in out
    # pre-existing outputs untouched
    np.testing.assert_array_equal(read_png(str(ofolder / "000001.png")), marker)
    # missing ones produced
    assert read_png(str(ofolder / "000002.png")).shape == (32, 64, 3)
    assert read_png(str(ofolder / "000004.png")).shape == (32, 64, 3)


def test_device_select_nondefault(tmp_path, capsys):
    """-d 3 must place the input, banks, and compilation on device 3
    (round-1 bug: banks landed on the default device)."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device mesh")
    img = make_test_image(48, 64, 3, seed=31)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    write_png(inp, img)
    rc = cli.main(["-i", inp, "-o", outp, "-u", "2", "-d", "3", "-engine", "mxu"])
    assert rc == 0
    got = read_png(outp)
    from vkresample_tpu.core.plan import UpscalePlan
    from vkresample_tpu.pipeline.upscale import build_upscale

    plan = UpscalePlan(h=48, w=64, upscale=2.0, engine=Engine.MXU)
    want = oracle.upscale_oracle(img, plan)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # the committed device of the result is the selected one
    fn = build_upscale(plan, planar_out=True, device_id=3)
    out = fn(jax.device_put(img, jax.devices()[3]))
    assert list(out.devices())[0] == jax.devices()[3]
