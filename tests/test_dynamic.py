"""On-device animated pipeline (render/dynamic.py)."""

import jax
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render.dynamic import make_frame_fn
from raytracer_tpu.scenes import generate_scene1

CFG = RenderConfig(width=32, height=24, max_bounces=2, ray_chunk=768,
                   tile_h=8, tile_w=128)


def test_animated_frames_differ_and_converge():
    sc = generate_scene1()
    frame = make_frame_fn(sc, CFG, renderer="wavefront")
    flat = sc.flat
    img0, flat = jax.block_until_ready(frame(flat, sc.camera, sc.light,
                                             0.0, 1 / 30))
    img1, flat = jax.block_until_ready(frame(flat, sc.camera, sc.light,
                                             0.8, 1 / 30))
    a, b = np.asarray(img0), np.asarray(img1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # spheres moved

    # same elapsed time -> same image (bounce is absolute-time)
    img0b, _ = frame(sc.flat, sc.camera, sc.light, 0.0, 1 / 30)
    np.testing.assert_allclose(np.asarray(img0b), a, atol=1e-6)


def test_animated_pallas_matches_wavefront():
    sc = generate_scene1()
    f_w = make_frame_fn(sc, CFG, renderer="wavefront")
    f_p = make_frame_fn(sc, CFG, renderer="pallas")
    iw, _ = f_w(sc.flat, sc.camera, sc.light, 0.5, 1 / 30)
    ip, _ = f_p(sc.flat, sc.camera, sc.light, 0.5, 1 / 30)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(iw), atol=2e-5)


def test_animated_split_matches_refit_oracle():
    """Triangle-static animation through the production split kernel
    (device-side pre-row refresh) matches the REFERENCE dynamic semantic:
    a grow-refit (updateBVH, main.cpp:1068-1077) of the original tree,
    rendered through the static split pipeline. (The wavefront dynamic
    path rebuilds an LBVH instead, which gates the infinite floor by the
    NEW tree's leaf box — a deliberate, documented divergence — so the
    oracle here is refit, not wavefront.)"""
    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.anim.animation import bounce_spheres
    from raytracer_tpu.render import pallas_split

    sc = generate_scene1()
    f_s = make_frame_fn(sc, CFG, renderer="split")
    from raytracer_tpu.accel.bvh import refit_grow
    for t in (0.0, 0.5, 1.3):
        flat_t = bounce_spheres(sc.flat, tuple(sc.bounce_params), t)
        bvh_t = refit_grow(build_bvh(sc.flat, sc.bvh_max_depth), flat_t)
        lin_t = linearize(bvh_t)
        oracle = pallas_split.render(flat_t, lin_t, sc.camera, sc.light,
                                     CFG)
        isp, _ = f_s(sc.flat, sc.camera, sc.light, t, 1 / 30)
        d = np.abs(np.asarray(isp) - np.asarray(oracle)).max(axis=-1)
        # animation transforms are evaluated inside jit on one path and
        # on the host on the other; a 1-ulp difference in a sphere center
        # can flip the winner at a silhouette pixel, so allow a handful
        # of grazing-tie pixels but keep everything else bit-tight
        assert (d > 1e-4).mean() < 0.005, (d.max(), (d > 1e-4).sum())
        assert np.median(d) <= 1e-6


def test_animated_sorted_hybrid_matches_unsorted():
    """The sorted-continuation hybrid (cfg.sort_bounces) composed with the
    animated device-refresh path (update_pre_rows / update_dynamic) must
    match the unsorted animated frame: the sort re-packs rays BETWEEN the
    two wholeframe launches and the refresh happens upstream of both, so
    per-lane hit decisions are identical and colors agree up to f32 add
    reassociation (the bench's scene2_anim leg runs this config —
    reference workload: rotating wheels, main.cpp:1084-1109)."""
    sc = generate_scene1()
    f_plain = make_frame_fn(sc, CFG, renderer="split")
    f_sorted = make_frame_fn(sc, CFG.replace(sort_bounces=True),
                             renderer="split")
    dt = 1 / 30
    cur_p, cur_s = sc.flat, sc.flat
    for k in range(2):
        img_p, cur_p = f_plain(cur_p, sc.camera, sc.light, k * dt, dt)
        img_s, cur_s = f_sorted(cur_s, sc.camera, sc.light, k * dt, dt)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_p),
                               atol=1e-6)


def test_wheel_animation_split_matches_host_prepare():
    """Wheel (triangle-moving) animation through the production split
    kernel: device tri-row refresh + BVH refit (update_tri_rows) must
    match a fresh HOST SplitScene prepare of the same animated geometry.
    The host path rebuilds a new tri tree; the device path refits the
    frame-0 topology — both are exact (any containing tri tree is), so
    images agree up to FMA-rounding silhouette ties."""
    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.anim.animation import rotate_wheels
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.scenes import generate_scene2

    sc2 = generate_scene2()
    assert sc2.wheels, "scene 2 must carry wheel metadata"
    # subset the scene to keep interpret-mode cost down, with whole wheels
    import numpy as _np
    st = _np.asarray(sc2.flat.shape_type)
    wheel_ids = sorted({int(i) for w in sc2.wheels[:2]
                        for i in _np.asarray(w["indices"])})
    keep = _np.concatenate([_np.flatnonzero(st != 3)[::4],
                            _np.asarray(wheel_ids, _np.int64)])
    keep = _np.sort(_np.unique(keep))
    remap = {int(g): i for i, g in enumerate(keep)}
    flat = sc2.flat.take(keep)
    wheels = []
    for w in sc2.wheels[:2]:
        wheels.append(dict(w, indices=[remap[int(i)]
                                       for i in _np.asarray(w["indices"])]))

    class Meta:
        bounce_params = ()
    meta = Meta()
    meta.wheels = wheels
    meta.flat = flat
    meta.bvh_max_depth = 8

    frame = make_frame_fn(meta, CFG, renderer="split")
    dt = 1 / 30
    cur = flat
    host = flat
    for k in range(3):
        img_dev, cur = frame(cur, sc2.camera, sc2.light, k * dt, dt)
    for k in range(3):
        host = rotate_wheels(host, wheels, dt)
    lin_h = linearize(build_bvh(host, 8))
    oracle = pallas_split.render(host, lin_h, sc2.camera, sc2.light, CFG)
    d = np.abs(np.asarray(img_dev) - np.asarray(oracle)).max(axis=-1)
    assert (d > 1e-4).mean() < 0.005, (d.max(), (d > 1e-4).sum())
    assert np.median(d) <= 1e-6
    # triangles really moved across frames
    assert np.abs(np.asarray(cur.tri_p1) - np.asarray(flat.tri_p1)).max() \
        > 1e-3
