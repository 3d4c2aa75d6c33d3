"""Binned-SAH builder (accel/sah.py): structural invariants and
render parity with the median tree (any contained-shape tree is exact —
render/pallas_split.py module docstring)."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.accel.sah import build_sah
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import TRIANGLE
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene1


@pytest.fixture(scope="module")
def scene1():
    sc = generate_scene1()
    lin = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    return sc, lin


def _tri_tree(sc, leaf_target=64):
    st = np.asarray(sc.flat.shape_type)
    tri_ids = np.nonzero(st == TRIANGLE)[0].astype(np.int32)
    mins, maxs = shape_aabbs(sc.flat)
    centers = shape_centers(sc.flat)
    t = build_sah(aabbs=(mins[tri_ids], maxs[tri_ids]),
                  centers=centers[tri_ids], leaf_target=leaf_target)
    return t, tri_ids, mins[tri_ids], maxs[tri_ids]


def test_sah_structure(scene1):
    sc, _ = scene1
    t, tri_ids, mins, maxs = _tri_tree(sc)
    m = t.num_nodes
    # root last; children precede parents (post-order emit)
    for i in range(m):
        if t.left[i] != -1:
            assert t.left[i] < i and t.right[i] < i
    # leaves partition the id set exactly once
    leaf = t.left == -1
    got = []
    for i in np.nonzero(leaf)[0]:
        got.extend(t.indices[t.start[i]:t.start[i] + t.count[i]].tolist())
    assert sorted(got) == list(range(len(tri_ids)))
    # child boxes inside parent boxes
    for i in range(m):
        if t.left[i] == -1:
            continue
        for c in (t.left[i], t.right[i]):
            assert (t.bounds_min[i] <= t.bounds_min[c] + 1e-6).all()
            assert (t.bounds_max[i] >= t.bounds_max[c] - 1e-6).all()
    # every leaf box contains its members' AABBs
    for i in np.nonzero(leaf)[0]:
        ids = t.indices[t.start[i]:t.start[i] + t.count[i]]
        assert (t.bounds_min[i] <= mins[ids] + 1e-6).all()
        assert (t.bounds_max[i] >= maxs[ids] - 1e-6).all()


def test_sah_render_matches_median(scene1):
    sc, lin = scene1
    cfg = RenderConfig(width=32, height=24, max_bounces=3, use_bvh=True,
                       ray_chunk=768, tile_h=8, tile_w=128)
    img_m = np.asarray(pallas_split.render(
        sc.flat, lin, sc.camera, sc.light, cfg,
        split=pallas_split.prepare(sc.flat, lin, tri_builder="median")))
    img_s = np.asarray(pallas_split.render(
        sc.flat, lin, sc.camera, sc.light, cfg,
        split=pallas_split.prepare(sc.flat, lin, tri_builder="sah")))
    np.testing.assert_allclose(img_s, img_m, atol=1e-6)
