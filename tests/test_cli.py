"""CLI smoke tests (arg plumbing + knobs; renders at tiny sizes)."""

import json
import os

import numpy as np
import pytest

from raytracer_tpu import cli


def test_render_command(tmp_path):
    out = str(tmp_path / "o.png")
    cli.main(["render", "--scene", "3", "--width", "32", "--height", "24",
              "--renderer", "reference", "--out", out])
    assert os.path.exists(out)
    assert open(out, "rb").read(4) == b"\x89PNG"


def test_material_and_light_edit(tmp_path):
    out1 = str(tmp_path / "a.png")
    out2 = str(tmp_path / "b.png")
    base = ["render", "--scene", "3", "--width", "32", "--height", "24",
            "--renderer", "reference"]
    cli.main(base + ["--out", out1])
    cli.main(base + ["--out", out2, "--material", "0:color=1,0,0",
                     "--light-intensity", "50"])
    a = open(out1, "rb").read()
    b = open(out2, "rb").read()
    assert a != b  # edits changed the image


def test_bench_command(capsys):
    cli.main(["bench", "--scene", "3", "--width", "32", "--height", "24",
              "--renderer", "reference", "--iters", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["fps"] > 0
    assert stats["scene"] == "scene3_triangle"


def test_animate_command(tmp_path):
    d = str(tmp_path / "frames")
    cli.main(["animate", "--scene", "3", "--width", "32", "--height", "24",
              "--renderer", "reference", "--frames", "2", "--out-dir", d])
    assert sorted(os.listdir(d)) == ["frame_0000.png", "frame_0001.png"]


def test_play_scripted_session(tmp_path, capsys):
    """Interactive driver: scripted key/mouse events move the camera across
    frames (the reference's processInput loop, main.cpp:509-551, as a used
    path rather than test-only pure functions)."""
    script = tmp_path / "session.txt"
    script.write_text(
        "# walk forward, look right, strafe\n"
        "key w 0.5\n"
        "mouse 40 0\n"
        "key d 0.5\n"
        "wait\n"
        "quit\n")
    d = str(tmp_path / "frames")
    cli.main(["play", "--scene", "3", "--width", "32", "--height", "24",
              "--renderer", "reference", "--script", str(script),
              "--out-dir", d])
    out = capsys.readouterr().out.strip().splitlines()
    stats = [json.loads(l) for l in out if l.startswith("{")]
    assert len(stats) == 4  # one frame per non-quit event
    # camera moved: forward (w) changes position; frame 0 vs 2 differ
    assert stats[0]["pos"] != stats[2]["pos"]
    # 'mouse'/'wait' do not move the position
    assert stats[0]["pos"] == stats[1]["pos"]
    assert stats[2]["pos"] == stats[3]["pos"]
    frames = sorted(os.listdir(d))
    assert frames == [f"play_{i:04d}.png" for i in range(4)]
    # the rendered images actually changed as the camera moved
    imgs = [open(os.path.join(d, f), "rb").read() for f in frames]
    assert imgs[0] != imgs[1] or imgs[1] != imgs[2]


def test_animate_dynamic_split(tmp_path):
    """--dynamic with the production split kernel: scene 1 is triangle-
    static, so the CLI routes to the device pre-row-refresh path."""
    d = str(tmp_path / "frames")
    cli.main(["animate", "--scene", "1", "--width", "32", "--height", "24",
              "--renderer", "pallas-split", "--dynamic", "--frames", "2",
              "--out-dir", d])
    assert sorted(os.listdir(d)) == ["frame_0000.png", "frame_0001.png"]


def test_play_feature_toggles(tmp_path, capsys):
    """Mid-session feature toggles (the remaining ImGui-panel knobs,
    main.cpp:377-382): bounces N, fresnel on/off, renderer X are event
    lines that re-configure subsequent frames without restarting."""
    import numpy as np
    from raytracer_tpu.io.image import read_png

    script = tmp_path / "session.txt"
    script.write_text(
        "wait\n"
        "bounces 1\n"
        "fresnel on\n"
        "renderer wavefront\n"
        "quit\n")
    d = str(tmp_path / "frames")
    cli.main(["play", "--scene", "3", "--width", "32", "--height", "24",
              "--renderer", "reference", "--script", str(script),
              "--out-dir", d])
    out = capsys.readouterr().out.strip().splitlines()
    stats = [json.loads(l) for l in out if l.startswith("{")]
    assert len(stats) == 4
    frames = sorted(os.listdir(d))
    assert frames == [f"play_{i:04d}.png" for i in range(4)]
    imgs = [read_png(os.path.join(d, f)) for f in frames]
    # dropping to 1 bounce removes reflections -> frame 1 differs from 0
    assert np.abs(imgs[1].astype(int) - imgs[0].astype(int)).max() > 0
    # fresnel adds the (1-w)*color*phong term on specular lanes even in
    # the final bounce (gpu_shader.comp:510 double-count), so toggling
    # it on changes the frame even at bounces=1
    assert np.abs(imgs[2].astype(int) - imgs[1].astype(int)).max() > 0
    # the wavefront renderer agrees with the oracle on the same config
    np.testing.assert_allclose(imgs[3].astype(int), imgs[2].astype(int),
                               atol=1)


def test_play_bvh_mt_toggles(tmp_path, capsys):
    """Mid-session useBVH / useMollerTrumbore flips (the last ImGui knobs,
    main.cpp:377-382 useBVH checkbox, :400-407 MT checkbox): `bvh off`
    re-prepares the production split tables without leaf-box gates (the
    scene-1 floor quirk-wall goes infinite, shadow eps 1e-3 -> 1e-5) and
    `bvh on` restores the exact starting state; `mt on` switches the
    triangle test for subsequent frames."""
    from raytracer_tpu.io.image import read_png

    script = tmp_path / "session.txt"
    script.write_text(
        "wait\n"        # frame 0: BVH on (default)
        "bvh off\n"     # frame 1: linear-scan semantics
        "bvh on\n"      # frame 2: must round-trip to frame 0 exactly
        "mt on\n"       # frame 3: Moller-Trumbore triangle test
        "quit\n")
    d = str(tmp_path / "frames")
    cli.main(["play", "--scene", "1", "--width", "32", "--height", "24",
              "--renderer", "pallas-split", "--script", str(script),
              "--out-dir", d])
    out = capsys.readouterr().out.strip().splitlines()
    stats = [json.loads(l) for l in out if l.startswith("{")]
    assert len(stats) == 4
    frames = sorted(os.listdir(d))
    assert frames == [f"play_{i:04d}.png" for i in range(4)]
    imgs = [read_png(os.path.join(d, f)) for f in frames]
    # BVH off: the degenerate floor wall loses its reference leaf-box
    # clip (renders as a true infinite plane) and the shadow epsilon
    # changes -> the frame differs
    assert np.abs(imgs[1].astype(int) - imgs[0].astype(int)).max() > 0
    # flipping back restores the exact starting configuration
    np.testing.assert_array_equal(imgs[2], imgs[0])
