"""Pallas packet-traversal BVH megakernel — the TPU-native answer to the
reference's per-thread stack walk (intersectScene2, gpu_shader.comp:380-430).

A GPU gives every pixel its own stack and scheduler; a TPU gives you a
scalar unit + an 8x128 vector unit. So instead of per-lane divergent
traversal (which would need per-lane gathers Mosaic doesn't do), each
PROGRAM traverses the BVH ONCE for its whole ray tile with a single scalar
DFS skip-pointer:

  - node bounds live in VMEM, topology (leaf_start/leaf_count/skip) in
    SMEM via scalar prefetch;
  - at each node the AABB slab test runs per-lane (vector); the tile
    descends iff ANY lane hits (scalar any-reduce) — a ray-packet
    traversal over the union of the tile's rays;
  - at a leaf, shapes are tested one-by-one with scalar broadcasts; each
    lane accepts a hit only if ITS OWN ray hit the leaf box, so per-ray
    results are IDENTICAL to the reference's per-thread traversal (child
    boxes nest inside parents, so any-lane descent never changes per-ray
    visibility — see accel.linearize.shape_leaf_boxes);
  - optional t-culling (skip subtrees whose box entry t exceeds the lane's
    current best) — a pure optimization that cannot change the closest hit
    for box-CONTAINED shapes; nodes whose subtree holds a degenerate
    (infinite-plane) wall are flagged non-cullable since such walls can hit
    OUTSIDE their box (the scene-1 floor quirk).

Primary/shadow/reflection waves reuse the same kernel; the Whitted loop
stays in JAX (render/whitted.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.accel.linearize import LinearBVH
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene, SPHERE, PLANE, WALL, TRIANGLE
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom import rowwise
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import shading, whitted
from raytracer_tpu.render.pallas_kernel import _auto_interpret

# rows field indices (geom/rowwise.py)
F_TYPE = 0
F_CX, F_CY, F_CZ, F_R = 1, 2, 3, 4
F_NX, F_NY, F_NZ, F_PD = 5, 6, 7, 8
F_V1X, F_V1Y, F_V1Z = 9, 10, 11
F_V2X, F_V2Y, F_V2Z = 12, 13, 14
F_V3X, F_V3Y, F_V3Z = 15, 16, 17
F_S0, F_S1, F_S2, F_S3, F_S4 = 18, 19, 20, 21, 22
F_WDEG = 23


def node_cullable_flags(lin: LinearBVH, scene: FlatScene) -> np.ndarray:
    """1.0 where a node's whole DFS subtree is free of degenerate-basis
    walls (safe for t-culling), else 0.0."""
    from raytracer_tpu.geom.direct import wall_basis

    _, _, w_deg = wall_basis(scene.plane_normal)
    deg = (np.asarray(w_deg)
           & (np.asarray(scene.shape_type) == WALL)).astype(np.int32)
    perm = np.asarray(lin.perm)
    starts = np.asarray(lin.leaf_start)
    counts = np.asarray(lin.leaf_count)
    skip = np.asarray(lin.skip)
    m = lin.num_nodes
    # per-leaf degenerate count, then prefix over DFS order
    leaf_deg = np.zeros(m, np.int64)
    for i in np.nonzero(counts > 0)[0]:
        leaf_deg[i] = deg[perm[starts[i]:starts[i] + counts[i]]].sum()
    pref = np.concatenate([[0], np.cumsum(leaf_deg)])
    # subtree of node i is DFS range [i, skip[i])
    sub = pref[skip] - pref[np.arange(m)]
    return (sub == 0).astype(np.float32)


def _row_intersect(rows_ref, i, ox, oy, oz, dx, dy, dz, aa, use_mt):
    """Union intersection of every lane's ray with shape row ``i`` (scalar
    broadcasts). Same math as geom.rowwise.intersect_rows / the reference
    gpu_shader.comp:242-328."""
    typ = rows_ref[i, F_TYPE]

    # sphere
    ocx = ox - rows_ref[i, F_CX]
    ocy = oy - rows_ref[i, F_CY]
    ocz = oz - rows_ref[i, F_CZ]
    r = rows_ref[i, F_R]
    bb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = bb * bb - 4.0 * aa * cc
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t_sph = (-bb - sq) / (2.0 * aa)
    v_sph = (disc > 0) & (t_sph > 0)

    # plane family
    nx = rows_ref[i, F_NX]
    ny = rows_ref[i, F_NY]
    nz = rows_ref[i, F_NZ]
    d_n = dx * nx + dy * ny + dz * nz
    o_n = ox * nx + oy * ny + oz * nz
    t_pl = -(rows_ref[i, F_PD] + o_n) / jnp.where(d_n == 0, 1.0, d_n)
    v_pl = (d_n > 0) & (t_pl > 0)
    tw_ = jnp.where(v_pl, t_pl, 0.0)
    hx = ox + tw_ * dx
    hy = oy + tw_ * dy
    hz = oz + tw_ * dz

    v1x, v1y, v1z = rows_ref[i, F_V1X], rows_ref[i, F_V1Y], rows_ref[i, F_V1Z]
    v2x, v2y, v2z = rows_ref[i, F_V2X], rows_ref[i, F_V2Y], rows_ref[i, F_V2Z]
    s0, s1 = rows_ref[i, F_S0], rows_ref[i, F_S1]
    s2, s3, s4 = rows_ref[i, F_S2], rows_ref[i, F_S3], rows_ref[i, F_S4]

    # wall
    u_proj = hx * v1x + hy * v1y + hz * v1z - s0
    v_proj = hx * v2x + hy * v2y + hz * v2z - s1
    outside_w = (u_proj < 0) | (u_proj > s2) | (v_proj < 0) | (v_proj > s3)
    v_wall = v_pl & ((rows_ref[i, F_WDEG] > 0) | ~outside_w)

    if use_mt:
        hcx = dy * v2z - dz * v2y
        hcy = dz * v2x - dx * v2z
        hcz = dx * v2y - dy * v2x
        a = v1x * hcx + v1y * hcy + v1z * hcz
        ok = jnp.abs(a) >= 1e-5
        f = 1.0 / jnp.where(ok, a, 1.0)
        smx = ox - rows_ref[i, F_V3X]
        smy = oy - rows_ref[i, F_V3Y]
        smz = oz - rows_ref[i, F_V3Z]
        u = f * (smx * hcx + smy * hcy + smz * hcz)
        ok = ok & (u >= 0) & (u <= 1)
        qx = smy * v1z - smz * v1y
        qy = smz * v1x - smx * v1z
        qz = smx * v1y - smy * v1x
        v = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (v >= 0) & (u + v <= 1)
        t_tri = f * (v2x * qx + v2y * qy + v2z * qz)
        v_tri = ok & (t_tri > 0)
    else:
        d20 = hx * v1x + hy * v1y + hz * v1z - s0
        d21 = hx * v2x + hy * v2y + hz * v2z - s1
        v = s2 * d20 - s3 * d21
        w = s4 * d21 - s3 * d20
        u = 1.0 - v - w
        v_tri = v_pl & ~((u < 0) | (v < 0) | (w < 0))
        t_tri = t_pl

    # Mosaic cannot legalize arith.select with a SCALAR predicate over
    # VECTOR operands — select by type via boolean algebra instead.
    is_sph = typ == SPHERE
    is_pl = typ == PLANE
    is_wall = typ == WALL
    is_tri = typ == TRIANGLE
    inner = ((v_sph & is_sph) | (v_pl & is_pl) | (v_wall & is_wall)
             | (v_tri & is_tri))
    shape = ox.shape
    t = jnp.where(jnp.broadcast_to(is_sph, shape), t_sph,
                  jnp.where(jnp.broadcast_to(is_tri, shape), t_tri, t_pl))
    return t, inner


def _packet_kernel(leaf_start_ref, leaf_count_ref, skip_ref,
                   nodes_ref, rows_ref, rays_ref, t_ref, sid_ref,
                   *, m, use_mt, t_cull):
    """Flat state machine: ONE unit of work per while iteration — either an
    AABB probe (entering a node, k == 0) or one leaf-shape test (k > 0).
    No nested cond/fori: Mosaic's compiler hangs on while(cond(fori))
    nests, and a flat body keeps every op a plain masked vector op.
    State: (ptr scalar, k scalar progress-in-leaf, box_hit lanes of the
    CURRENT leaf, t_best, sid_best)."""
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32)
    s0 = jnp.zeros(shape, jnp.int32)
    gate0 = jnp.zeros(shape, jnp.float32)  # f32 mask: i1 vectors
    # in while-carries hit a Mosaic truncation limitation

    def cond(state):
        return state[0] < m

    def body(state):
        ptr, k, gate, t_best, sid_best = state
        entering = k == 0

        # ---- AABB probe (meaningful when entering; cheap enough to always
        # compute) -------------------------------------------------------
        b0x = nodes_ref[ptr, 0]
        b0y = nodes_ref[ptr, 1]
        b0z = nodes_ref[ptr, 2]
        b1x = nodes_ref[ptr, 3]
        b1y = nodes_ref[ptr, 4]
        b1z = nodes_ref[ptr, 5]
        tx0 = (b0x - ox) * inv_dx
        tx1 = (b1x - ox) * inv_dx
        ty0 = (b0y - oy) * inv_dy
        ty1 = (b1y - oy) * inv_dy
        tz0 = (b0z - oz) * inv_dz
        tz1 = (b1z - oz) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                       jnp.maximum(ty0, ty1)),
                           jnp.maximum(tz0, tz1))
        box_hit = (tmax >= tmin) & (tmax > 0)
        if t_cull:
            cullable = nodes_ref[ptr, 6]
            probe = box_hit & ((cullable == 0.0) | (tmin <= t_best))
        else:
            probe = box_hit
        any_hit = jnp.any(probe)

        st = leaf_start_ref[ptr]
        cnt = leaf_count_ref[ptr]
        sk = skip_ref[ptr]
        is_leaf = cnt > 0

        # entering a hittable leaf -> latch the per-lane box gate
        start_leaf = entering & any_hit & is_leaf
        gate = jnp.where(jnp.broadcast_to(start_leaf, shape),
                         box_hit.astype(jnp.float32), gate)
        in_leaf = start_leaf | jnp.logical_not(entering)

        # ---- one leaf-shape test (masked when not in a leaf) -------------
        j = k  # shape index within leaf (0 on the entering step)
        row = st + j
        t, inner = _row_intersect(rows_ref, row, ox, oy, oz, dx, dy, dz,
                                  aa, use_mt)
        # per-lane leaf-box gating = reference per-thread traversal
        better = inner & (gate > 0) & in_leaf & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        sid_best = jnp.where(better, row, sid_best)

        # ---- advance (scalar arithmetic selects) -------------------------
        k_next = k + 1
        leaf_done = in_leaf & (k_next >= cnt)
        go_deeper = entering & any_hit & jnp.logical_not(is_leaf)
        stay = (in_leaf & jnp.logical_not(leaf_done)).astype(jnp.int32)
        deeper = go_deeper.astype(jnp.int32)
        new_ptr = stay * ptr + (1 - stay) * (deeper * (ptr + 1)
                                             + (1 - deeper) * sk)
        new_k = stay * k_next
        return new_ptr, new_k, gate, t_best, sid_best

    _, _, _, t_best, sid_best = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), gate0, t0, s0))
    t_ref[0] = t_best
    sid_ref[0] = sid_best


def _occlusion_kernel(leaf_start_ref, leaf_count_ref, skip_ref,
                      nodes_ref, rows_ref, rays_ref, occ_ref,
                      *, m, use_mt, t_cull):
    """Any-hit variant for shadow rays: lane is occluded iff ANY INNER hit
    has t < max_t (per-lane light distance, rays row 6). Occluded lanes are
    dropped from the probe union, so fully-shadowed tiles terminate after a
    root test. Same flat state machine as _packet_kernel."""
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    max_t = rays_ref[6, 0]
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    shape = ox.shape
    occ0 = jnp.zeros(shape, jnp.float32)
    gate0 = jnp.zeros(shape, jnp.float32)

    def cond(state):
        return state[0] < m

    def body(state):
        ptr, k, gate, occ = state
        entering = k == 0

        b0x = nodes_ref[ptr, 0]
        b0y = nodes_ref[ptr, 1]
        b0z = nodes_ref[ptr, 2]
        b1x = nodes_ref[ptr, 3]
        b1y = nodes_ref[ptr, 4]
        b1z = nodes_ref[ptr, 5]
        tx0 = (b0x - ox) * inv_dx
        tx1 = (b1x - ox) * inv_dx
        ty0 = (b0y - oy) * inv_dy
        ty1 = (b1y - oy) * inv_dy
        tz0 = (b0z - oz) * inv_dz
        tz1 = (b1z - oz) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                       jnp.maximum(ty0, ty1)),
                           jnp.maximum(tz0, tz1))
        box_hit = (tmax >= tmin) & (tmax > 0)
        probe = box_hit & (occ == 0.0)
        if t_cull:
            # a subtree can only occlude if its entry t is below the light
            # distance (contained shapes have t >= tmin); infinite-wall
            # subtrees are non-cullable
            cullable = nodes_ref[ptr, 6]
            probe = probe & ((cullable == 0.0) | (tmin <= max_t))
        any_hit = jnp.any(probe)

        st = leaf_start_ref[ptr]
        cnt = leaf_count_ref[ptr]
        sk = skip_ref[ptr]
        is_leaf = cnt > 0

        start_leaf = entering & any_hit & is_leaf
        gate = jnp.where(jnp.broadcast_to(start_leaf, shape),
                         box_hit.astype(jnp.float32), gate)
        in_leaf = start_leaf | jnp.logical_not(entering)

        j = k
        row = st + j
        t, inner = _row_intersect(rows_ref, row, ox, oy, oz, dx, dy, dz,
                                  aa, use_mt)
        hit_now = inner & (gate > 0) & in_leaf & (t < max_t)
        occ = jnp.where(hit_now, 1.0, occ)

        k_next = k + 1
        leaf_done = in_leaf & (k_next >= cnt)
        go_deeper = entering & any_hit & jnp.logical_not(is_leaf)
        stay = (in_leaf & jnp.logical_not(leaf_done)).astype(jnp.int32)
        deeper = go_deeper.astype(jnp.int32)
        new_ptr = stay * ptr + (1 - stay) * (deeper * (ptr + 1)
                                             + (1 - deeper) * sk)
        new_k = stay * k_next
        return new_ptr, new_k, gate, occ

    _, _, _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), gate0, occ0))
    occ_ref[0] = occ


def make_closest_hit(lin: LinearBVH, scene: FlatScene, cfg: RenderConfig,
                     rows: jnp.ndarray = None, t_cull: bool = True,
                     cull_flags: jnp.ndarray = None):
    """Build closest_hit(o, d) -> (t, sid_global, hit) from the packet
    kernel. ``rows`` lets callers pass pre-packed geometry (for custom
    scenes); default packs from ``scene``. ``cull_flags`` (host-computed,
    node_cullable_flags) must be supplied when tracing under jit with
    t_cull on."""
    interpret = _auto_interpret(cfg)
    th, tw = cfg.tile_h, cfg.tile_w
    m = lin.num_nodes

    if rows is None:
        rows = rowwise.pack_rows(scene)
    rows_perm = jnp.take(rows, lin.perm, axis=0)
    k = rows_perm.shape[0]
    k_pad = max(((k + 127) // 128) * 128, 128)
    # row-major (K_pad, F): dynamic sublane + static lane indexing only
    rows_nm = jnp.pad(rows_perm, ((0, k_pad - k), (0, 0)))

    m_pad = max(((m + 7) // 8) * 8, 8)
    nodes = jnp.zeros((m_pad, 8), jnp.float32)
    nodes = nodes.at[:m, 0:6].set(lin.bounds)
    if t_cull:
        if cull_flags is None:
            cull_flags = jnp.asarray(node_cullable_flags(lin, scene))
        nodes = nodes.at[:m, 6].set(cull_flags)

    leaf_start = lin.leaf_start
    leaf_count = lin.leaf_count
    skip = lin.skip

    kernel = functools.partial(_packet_kernel, m=m, use_mt=cfg.use_mt,
                               t_cull=t_cull)

    @jax.jit
    def closest_hit(o: jnp.ndarray, d: jnp.ndarray):
        r = o.shape[0]
        tile = th * tw
        pad = (-r) % tile
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        g = o.shape[0] // tile
        rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2]])
        rays = rays.reshape(6, g, th, tw)

        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((m_pad, 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_pad, rows_nm.shape[1]),
                             lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 1, th, tw), lambda i, *_: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0)),
            ],
        )
        t, sid = pl.pallas_call(
            kernel,
            grid_spec=spec,
            out_shape=[
                jax.ShapeDtypeStruct((g, th, tw), jnp.float32),
                jax.ShapeDtypeStruct((g, th, tw), jnp.int32),
            ],
            interpret=interpret,
        )(leaf_start, leaf_count, skip, nodes, rows_nm, rays)

        t = t.reshape(-1)[:r]
        sid_local = sid.reshape(-1)[:r]
        hit = t < INF
        sid_global = jnp.take(lin.perm, jnp.minimum(sid_local, k - 1))
        return t, sid_global, hit

    occl_kernel = functools.partial(_occlusion_kernel, m=m,
                                    use_mt=cfg.use_mt, t_cull=t_cull)

    @jax.jit
    def occlusion(o: jnp.ndarray, d: jnp.ndarray, max_t: jnp.ndarray):
        r = o.shape[0]
        tile = th * tw
        pad = (-r) % tile
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            max_t = jnp.pad(max_t, ((0, pad),))
        g = o.shape[0] // tile
        rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2], max_t])
        rays = rays.reshape(7, g, th, tw)

        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((m_pad, 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_pad, rows_nm.shape[1]),
                             lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, 1, th, tw), lambda i, *_: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0)),
            ],
        )
        occ, = pl.pallas_call(
            occl_kernel,
            grid_spec=spec,
            out_shape=[
                jax.ShapeDtypeStruct((g, th, tw), jnp.float32),
            ],
            interpret=interpret,
        )(leaf_start, leaf_count, skip, nodes, rows_nm, rays)
        return occ.reshape(-1)[:r] > 0

    closest_hit.occlusion = occlusion
    return closest_hit


# Debug toggles (module-level so perf bisection can flip them).
USE_OCCLUSION = False  # measured slower than closest-hit shadows on v5e
USE_REMAP = True


def _block_shape(tile: int):
    """Largest power-of-two bh with bh <= tile//bh: square-ish image blocks."""
    bh = 1
    while bh * 2 * (bh * 2) <= tile:
        bh *= 2
    return bh, tile // bh


@functools.partial(jax.jit, static_argnames=("cfg", "t_cull"))
def _render_impl(scene: FlatScene, lin: LinearBVH, cull_flags, camera, light,
                 cfg: RenderConfig, t_cull: bool):
    h, w = cfg.height, cfg.width
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

    closest = make_closest_hit(lin, scene, cfg, t_cull=t_cull,
                               cull_flags=cull_flags)

    # Remap pixels so each kernel tile covers a SQUARE-ish image block
    # instead of a row-major strip: packet traversal cost scales with the
    # union of the tile's ray footprints, and a 32x32 block's union is far
    # tighter than a 1.3-row 800-pixel strip's. Secondary waves keep their
    # lane positions, inheriting the spatial coherence.
    tile = cfg.tile_h * cfg.tile_w
    if USE_REMAP:
        bh, bw = _block_shape(tile)
    else:
        bh, bw = 1, tile
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw

    def to_blocks(x, fill=0.0):
        x = jnp.pad(x, ((0, hp - h), (0, wp - w), (0, 0)),
                    constant_values=fill)
        x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    # padded rays get parked so they never traverse
    o_b = to_blocks(o, fill=whitted.PARK_ORIGIN)
    d_b = to_blocks(d, fill=whitted._PARK_DIR)
    bg_b = to_blocks(bg)

    occl = closest.occlusion if USE_OCCLUSION else None
    colors = whitted.trace(scene, light, closest, o_b, d_b, bg_b, cfg,
                           occlusion_fn=occl)

    colors = colors.reshape(hp // bh, wp // bw, bh, bw, 3)
    colors = colors.transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)
    return colors[:h, :w]


# host-side cullable-flag cache: the numpy computation walks every node in
# Python and must not run per frame. Keyed by the BVH buffer identity.
_FLAGS_CACHE: dict = {}


def render(scene: FlatScene, bvh: LinearBVH, camera: Camera, light: Light,
           cfg: RenderConfig, t_cull: bool = True) -> jnp.ndarray:
    """Render (H, W, 3) with the packet-traversal BVH megakernel."""
    flags = None
    if t_cull:
        key = id(bvh.bounds)
        flags = _FLAGS_CACHE.get(key)
        if flags is None:
            flags = jnp.asarray(node_cullable_flags(bvh, scene))
            if len(_FLAGS_CACHE) > 16:
                _FLAGS_CACHE.clear()
            _FLAGS_CACHE[key] = flags
    return _render_impl(scene, bvh, flags, camera, light, cfg, t_cull)
