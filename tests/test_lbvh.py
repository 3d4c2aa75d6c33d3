"""On-device LBVH (accel/lbvh.py): structure, boxes, render parity, and
jit-ability for per-frame animated rebuild."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.accel.lbvh import build_lbvh, node_cullable_flags_device
from raytracer_tpu.accel.linearize import shape_leaf_boxes
from raytracer_tpu.anim import bounce_spheres
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
from raytracer_tpu.render import wavefront
from raytracer_tpu.render.reference import render as render_ref
from raytracer_tpu.scenes import generate_scene1


def _sphere_cloud(n=37, seed=0):
    b = SceneBuilder()
    rng = np.random.default_rng(seed)
    for i in range(n):
        b.add_sphere(rng.uniform(-10, 10, 3), rng.uniform(0.3, 1.0),
                     Material(color=tuple(rng.uniform(0, 1, 3))),
                     animated=(i < 3))
    return b.build()


def _lbvh_of(scene):
    mins, maxs = shape_aabbs(scene)
    cen = shape_centers(scene)
    return build_lbvh(jnp.asarray(mins), jnp.asarray(maxs),
                      jnp.asarray(cen))


def test_structure():
    s = _sphere_cloud()
    lin = _lbvh_of(s)
    n = s.num_shapes
    assert lin.num_nodes == 2 * n - 1
    perm = np.asarray(lin.perm)
    assert sorted(perm.tolist()) == list(range(n))
    lc = np.asarray(lin.leaf_count)
    ls = np.asarray(lin.leaf_start)
    assert (lc > 0).sum() == n
    assert sorted(ls[lc > 0].tolist()) == list(range(n))
    # descend-all walk visits every node exactly once
    sk = np.asarray(lin.skip)
    i, visits = 0, 0
    while i < lin.num_nodes and visits <= lin.num_nodes:
        visits += 1
        i = i + 1 if lc[i] == 0 else sk[i]
    assert visits == lin.num_nodes


def test_boxes():
    s = _sphere_cloud()
    lin = _lbvh_of(s)
    mins, maxs = shape_aabbs(s)
    bounds = np.asarray(lin.bounds)
    np.testing.assert_allclose(bounds[0, :3], mins.min(0), atol=1e-5)
    np.testing.assert_allclose(bounds[0, 3:], maxs.max(0), atol=1e-5)
    lc = np.asarray(lin.leaf_count)
    ls = np.asarray(lin.leaf_start)
    perm = np.asarray(lin.perm)
    for i in np.nonzero(lc)[0][:10]:
        sid = perm[ls[i]]
        np.testing.assert_allclose(bounds[i, :3], mins[sid], atol=1e-6)
        np.testing.assert_allclose(bounds[i, 3:], maxs[sid], atol=1e-6)


def test_render_parity_contained_scene():
    """All shapes contained in their boxes -> LBVH render == plain oracle
    exactly."""
    s = _sphere_cloud()
    lin = _lbvh_of(s)
    cfg = RenderConfig(width=48, height=36, max_bounces=2, ray_chunk=1728)
    cam = cam_ops.look_at(
        cam_ops.from_euler(position=(0, 0, 30), aspect=48 / 36), (0, 0, 0))
    light = Light((0, -20, 0), (1, 1, 1), 20)
    img_l = np.asarray(wavefront.render(s, lin, cam, light, cfg))
    img_o = np.asarray(render_ref(s, cam, light, cfg))
    np.testing.assert_allclose(img_l, img_o, atol=1e-6)


def test_scene1_build_and_self_consistency():
    sc = generate_scene1()
    mins, maxs = shape_aabbs(sc.flat)
    cen = shape_centers(sc.flat)
    lin = build_lbvh(jnp.asarray(mins), jnp.asarray(maxs), jnp.asarray(cen))
    assert lin.num_nodes == 2 * 1240 - 1
    cfg = RenderConfig(width=32, height=24, max_bounces=2, ray_chunk=768)
    img_l = np.asarray(wavefront.render(sc.flat, lin, sc.camera, sc.light,
                                        cfg))
    lb = shape_leaf_boxes(lin, sc.num_shapes)
    img_o = np.asarray(render_ref(sc.flat, sc.camera, sc.light, cfg,
                                  leaf_boxes=lb))
    np.testing.assert_allclose(img_l, img_o, atol=2e-5)


def test_jit_rebuild_per_frame():
    """The whole animate -> rebuild -> first-hit pipeline stays on device
    under one jit (static node count 2n-1)."""
    s = _sphere_cloud()
    bounce = [(0, 2.0, 1.0), (1, 1.0, 0.7)]

    @jax.jit
    def frame(flat, t):
        flat = bounce_spheres(flat, bounce, t)
        # sphere AABBs/centers in jnp (animated rebuild path)
        c = flat.sphere_center
        r = flat.sphere_radius[:, None]
        lin = build_lbvh(c - r, c + r, c)
        return lin

    lin1 = frame(s, 0.0)
    lin2 = frame(s, 1.3)
    assert lin1.num_nodes == lin2.num_nodes
    b1 = np.asarray(lin1.bounds)
    b2 = np.asarray(lin2.bounds)
    # some node box must move with the bouncing spheres (the root may not:
    # the animated spheres stay inside the static cloud's extent)
    assert np.abs(b1 - b2).max() > 1e-3


def test_cullable_flags_device():
    sc = generate_scene1()
    mins, maxs = shape_aabbs(sc.flat)
    cen = shape_centers(sc.flat)
    lin = build_lbvh(jnp.asarray(mins), jnp.asarray(maxs), jnp.asarray(cen))
    from raytracer_tpu.geom.direct import wall_basis
    from raytracer_tpu.core.scene import WALL
    _, _, wdeg = wall_basis(sc.flat.plane_normal)
    mask = wdeg & (sc.flat.shape_type == WALL)
    flags = np.asarray(node_cullable_flags_device(lin, mask))
    assert flags.shape[0] == lin.num_nodes
    assert flags[0] == 0.0            # root contains the infinite floor
    assert flags.sum() > lin.num_nodes * 0.9  # almost everything cullable
