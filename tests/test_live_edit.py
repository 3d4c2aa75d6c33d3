"""Live material/light editing mid-session — the ImGui panel's last
behavioral delta (reference src/main.cpp:384-429 edits materials and the
light WHILE the animation runs).

Covers the ADVICE r2 medium finding: ``update_pre_rows``/
``update_tri_rows`` carry the prepare()-time canonical resolve-id (RID)
columns forward, so editing a material after prepare() without
``update_materials`` silently shades every shape of the stale canonical
group with the group representative's material. ``update_materials``
recomputes the grouping host-side.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.render import pallas_split

CFG = RenderConfig(width=32, height=24, max_bounces=2, use_bvh=True,
                   ray_chunk=768, tile_h=8, tile_w=128)


def _shared_material_scene():
    """Two spheres SHARING one material 8-tuple (one canonical resolve
    group) plus an unrelated triangle."""
    b = SceneBuilder()
    m = Material(color=(0.2, 0.9, 0.3), specular=0.0)
    b.add_sphere((-1.2, 0.0, -5.0), 1.0, m)
    b.add_sphere((1.2, 0.0, -5.0), 1.0, m)
    b.add_triangle((-2.0, -2.0, -7.0), (2.0, -2.0, -7.0), (0.0, 2.5, -7.0),
                   Material(color=(0.4, 0.4, 0.9), specular=0.0))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=CFG.width / CFG.height)
    light = Light((0, 3, 0), (1, 1, 1), 5.0)
    return scene, cam, light


def test_update_materials_regroups_rid():
    scene, cam, light = _shared_material_scene()
    bvh = linearize(build_bvh(scene, 4))
    split = pallas_split.prepare(scene, bvh)
    # both spheres resolve through one canonical id; + the triangle's
    assert len(split.rid_values) == 2

    # edit sphere 1's color only — this SPLITS the canonical group
    edited = scene.replace(
        mat_color=jnp.asarray(scene.mat_color)
        .at[1].set(jnp.asarray([0.9, 0.1, 0.1], jnp.float32)))

    split2 = pallas_split.update_materials(split, edited)
    assert len(split2.rid_values) == 3

    img_updated = np.asarray(pallas_split.render(
        edited, bvh, cam, light, CFG, split=split2))
    img_fresh = np.asarray(pallas_split.render(edited, bvh, cam, light,
                                               CFG))
    np.testing.assert_allclose(img_updated, img_fresh, atol=2e-5)

    # the stale split (old RID columns) shades sphere 1 with sphere 0's
    # material — the exact failure update_materials exists to prevent
    img_stale = np.asarray(pallas_split.render(
        edited, bvh, cam, light, CFG, split=split))
    assert np.abs(img_stale - img_fresh).max() > 0.05


def test_update_materials_strength_columns():
    """Non-color material fields (the ImGui strength sliders) also
    propagate through update_materials on both row tables."""
    scene, cam, light = _shared_material_scene()
    bvh = linearize(build_bvh(scene, 4))
    split = pallas_split.prepare(scene, bvh)
    edited = scene.replace(
        mat_diffuse=jnp.asarray(scene.mat_diffuse).at[2].set(0.05),
        mat_ambient=jnp.asarray(scene.mat_ambient).at[2].set(0.9))
    split2 = pallas_split.update_materials(split, edited)
    img_updated = np.asarray(pallas_split.render(
        edited, bvh, cam, light, CFG, split=split2))
    img_fresh = np.asarray(pallas_split.render(edited, bvh, cam, light,
                                               CFG))
    np.testing.assert_allclose(img_updated, img_fresh, atol=2e-5)


def test_play_live_edits(tmp_path, capsys):
    """`play` consumes material/light events mid-session (reference ImGui
    editing while the scene runs, main.cpp:384-429) — frames reflect the
    edits, through the PRODUCTION split renderer's update_materials path."""
    from raytracer_tpu import cli

    script = tmp_path / "session.txt"
    script.write_text(
        "wait\n"
        "material 0:color=1,0,0\n"
        "light intensity 30\n"
        "wait\n"
        "quit\n")
    d = str(tmp_path / "frames")
    cli.main(["play", "--scene", "3", "--width", "32", "--height", "24",
              "--renderer", "pallas-split", "--script", str(script),
              "--out-dir", d])
    out = capsys.readouterr().out.strip().splitlines()
    stats = [json.loads(l) for l in out if l.startswith("{")]
    assert len(stats) == 4
    frames = sorted(os.listdir(d))
    assert frames == [f"play_{i:04d}.png" for i in range(4)]
    imgs = [open(os.path.join(d, f), "rb").read() for f in frames]
    assert imgs[1] != imgs[0]   # material edit changed the image
    assert imgs[2] != imgs[1]   # light intensity edit changed it again
    assert imgs[3] == imgs[2]   # 'wait' renders the same state
