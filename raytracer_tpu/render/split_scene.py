"""Host/device scene preparation for the split-phase kernel: the
SplitScene row tables (pre-pass + triangle + BVH metadata), the canonical
material-resolve grouping, and the per-frame device refresh functions.

Split out of render/pallas_split.py (VERDICT r4 item 8); the kernels that
consume these tables live there. Row-layout constants (G_*, T_*) are the
shared contract between the packers here and the kernel scalar loads.

Reference roles covered: serializeScene/serializeShape/serializeBVH
(src/main.cpp:806-846, 955-1066) become the SplitScene packers;
updateScene + updateBVH grow-refit (main.cpp:981-992, 1068-1077) become
update_pre_rows/update_tri_rows (pure jnp, jit-traceable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel import bvh as bvh_mod
from raytracer_tpu.accel.linearize import LinearBVH, linearize, \
    shape_leaf_boxes
from raytracer_tpu.core.scene import FlatScene, SPHERE, TRIANGLE
from raytracer_tpu.geom import rowwise
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
from raytracer_tpu.geom.direct import INF

# Target leaf size of the triangle-only BVH (any tree is exact — see
# module docstring). The default tri_max_depth is derived from this so
# leaves hold a few TRI_UNROLL batches regardless of scene size.
# 128 (round-2 re-sweep): scene 1's tree is identical at 96 and 128
# (m=49), while scene 2 drops from depth 7/m=191 to depth 6/m=127 —
# 31.8 -> 30.4 ms on v5e (fewer iterations wins; the walk is iteration-
# latency bound). Depth 8/9 and U=64 at depth 6 all measured worse.
TRI_LEAF_TARGET = 128



def _canonical_material_ids(scene: FlatScene) -> np.ndarray:
    """canon[g] = min gid over shapes whose material 8-tuple is bitwise
    identical to shape g's (see the T_RID note above)."""
    mat = np.stack([
        np.asarray(scene.mat_color[:, 0]),
        np.asarray(scene.mat_color[:, 1]),
        np.asarray(scene.mat_color[:, 2]),
        np.asarray(scene.mat_ambient), np.asarray(scene.mat_diffuse),
        np.asarray(scene.mat_specular), np.asarray(scene.mat_fresnel),
        np.asarray(scene.mat_shininess),
    ], axis=1)
    _, inv = np.unique(mat, axis=0, return_inverse=True)
    first = np.full(inv.max() + 1 if inv.size else 1, -1, np.int64)
    for g in range(scene.num_shapes - 1, -1, -1):
        first[inv[g]] = g
    return first[inv]


def _auto_tri_depth(n_tri: int) -> int:
    import math
    if n_tri <= TRI_LEAF_TARGET:
        return 1
    return 1 + max(1, math.ceil(math.log2(n_tri / TRI_LEAF_TARGET)))

# pre-pass row layout: geom pack (24) + gid + leaf box (6) + material (8)
# + rid (canonical resolve id, see below)
G_GID = 24
G_B0X, G_B0Y, G_B0Z, G_B1X, G_B1Y, G_B1Z = 25, 26, 27, 28, 29, 30
G_MCR, G_MCG, G_MCB = 31, 32, 33
G_MKA, G_MKD, G_MKS, G_MKF, G_MSH = 34, 35, 36, 37, 38
G_RID = 39
PRE_W = 40

# triangle row layout (lean): n, pd, e1, e2, p1, p1e1, p1e2, r11, r01, r00,
# gid, material, rid, + Gram-fused constants (cfg.use_gram_tri)
T_NX, T_NY, T_NZ, T_PD = 0, 1, 2, 3
T_E1X, T_E1Y, T_E1Z = 4, 5, 6
T_E2X, T_E2Y, T_E2Z = 7, 8, 9
T_P1X, T_P1Y, T_P1Z = 10, 11, 12
T_S0, T_S1, T_R11, T_R01, T_R00 = 13, 14, 15, 16, 17
T_GID = 18
T_MCR, T_MCG, T_MCB = 19, 20, 21
T_MKA, T_MKD, T_MKS, T_MKF, T_MSH = 22, 23, 24, 25, 26
T_RID = 27
# Ev = r11*e1 - r01*e2, cv = r11*s0 - r01*s1 (w-symmetric): barycentric
# v = (o.Ev - cv) + t*(d.Ev) without forming the hit point — 12 scalar
# loads vs 15 and ~4 fewer vector ops per test. Same accept set in exact
# arithmetic (f32-reassociated). v5e brute-mix A/B (benchmarks/ilp_ab.py
# gram32 vs tree32): 8.98 vs 10.07 ms (-10.8%).
T_EVX, T_EVY, T_EVZ, T_CV = 28, 29, 30, 31
T_EWX, T_EWY, T_EWZ, T_CW = 32, 33, 34, 35
TRI_W = 36


# rid = the canonical resolve id: min gid over shapes with an IDENTICAL
# material 8-tuple, computed at prepare() time. The wholeframe kernel's
# material resolve loops over the DISTINCT winning ids per tile — on mesh
# tiles that's up to hundreds of triangle gids while the mesh shares ~3
# materials. Resolving tab[rid] instead of tab[gid] is bit-exact (the
# loop reads only material columns, identical within a group) and
# collapses the loop to <= #distinct-materials iterations. v5e A/B
# (benchmarks/resolve_rid_ab.py): scene 2 32.9 -> 31.6 ms, scene 1
# neutral; max_abs_diff 0.0 on both. NOTE: editing material VALUES after
# prepare() without re-prepare() would stale the grouping — geometry-only
# animation (the reference's only kind, main.cpp:1079-1109) is unaffected.


@jax.tree_util.register_pytree_node_class
class SplitScene:
    """Host-prepared device arrays for the split kernel (static per scene;
    rebuilt on geometry changes). Registered pytree: array leaves + static
    counts so it can flow through jit."""

    def tree_flatten(self):
        children = (self.leaf_start, self.leaf_count, self.skip, self.nodes,
                    self.pre_rows, self.tri_rows, self.other_idx,
                    self.tri_gids, self.tri_leaf_id, self.leaf_lo,
                    self.leaf_hi, self.node_lo, self.node_hi)
        aux = (self.n_other, self.n_sph, self.n_tri, self.m, self.m_pad,
               self.n_leaf, self.rid_values)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.leaf_start, obj.leaf_count, obj.skip, obj.nodes,
         obj.pre_rows, obj.tri_rows, obj.other_idx,
         obj.tri_gids, obj.tri_leaf_id, obj.leaf_lo,
         obj.leaf_hi, obj.node_lo, obj.node_hi) = children
        (obj.n_other, obj.n_sph, obj.n_tri, obj.m, obj.m_pad,
         obj.n_leaf, obj.rid_values) = aux
        return obj

    def replace_leaves(self, **kw) -> "SplitScene":
        """Functional update of named pytree leaves."""
        children, aux = self.tree_flatten()
        names = ("leaf_start", "leaf_count", "skip", "nodes", "pre_rows",
                 "tri_rows", "other_idx", "tri_gids", "tri_leaf_id",
                 "leaf_lo", "leaf_hi", "node_lo", "node_hi")
        children = [kw.get(n, c) for n, c in zip(names, children)]
        return SplitScene.tree_unflatten(aux, tuple(children))

    def __init__(self, scene: FlatScene, ref_bvh: LinearBVH,
                 tri_max_depth: int | None = None,
                 tri_builder: str | None = None):
        st = np.asarray(scene.shape_type)
        canon = _canonical_material_ids(scene)
        # the distinct canonical resolve ids, STATIC: lets the wholeframe
        # resolve unroll over known table rows (static VMEM indexing, no
        # cross-lane syncs) instead of a distinct-id while loop
        self.rid_values = tuple(int(v) for v in np.unique(canon))
        tri_ids = np.nonzero(st == TRIANGLE)[0].astype(np.int32)
        other_ids = np.nonzero(st != TRIANGLE)[0].astype(np.int32)
        # Pre rows grouped by type — SPHERES first, then the plane family —
        # so the pre-pass can run one sphere-only loop and one plane/wall
        # loop instead of evaluating every type formula per shape (the
        # branchless union costs ~100 vector ops/shape; the split loops
        # ~35/~45). gid order kept within each group: the pre-pass t
        # comparison is strict, so ordering matters only on exact f32 ties.
        sph_ids = other_ids[st[other_ids] == SPHERE]
        pw_ids = other_ids[st[other_ids] != SPHERE]
        other_ids = np.concatenate([sph_ids, pw_ids]).astype(np.int32)
        self.n_sph = int(sph_ids.shape[0])
        self.n_other = int(other_ids.shape[0])
        self.n_tri = int(tri_ids.shape[0])
        if tri_max_depth is None:
            tri_max_depth = _auto_tri_depth(self.n_tri)

        # --- pre-pass rows: non-tri shapes + reference-tree leaf boxes ----
        rows = np.asarray(rowwise.pack_rows(scene))
        if ref_bvh is not None:
            bmin, bmax = shape_leaf_boxes(ref_bvh, scene.num_shapes)
            bmin, bmax = np.asarray(bmin), np.asarray(bmax)
        else:
            bmin = np.full((scene.num_shapes, 3), -INF, np.float32)
            bmax = np.full((scene.num_shapes, 3), INF, np.float32)
        pre = np.zeros((max(self.n_other, 1), PRE_W), np.float32)
        if self.n_other:
            pre[:, :24] = rows[other_ids]
            pre[:, G_GID] = other_ids.astype(np.float32)
            pre[:, G_B0X:G_B0X + 3] = bmin[other_ids]
            pre[:, G_B1X:G_B1X + 3] = bmax[other_ids]
            pre[:, G_MCR:G_MCR + 3] = np.asarray(scene.mat_color)[other_ids]
            pre[:, G_MKA] = np.asarray(scene.mat_ambient)[other_ids]
            pre[:, G_MKD] = np.asarray(scene.mat_diffuse)[other_ids]
            pre[:, G_MKS] = np.asarray(scene.mat_specular)[other_ids]
            pre[:, G_MKF] = np.asarray(scene.mat_fresnel)[other_ids]
            pre[:, G_MSH] = np.asarray(scene.mat_shininess)[other_ids]
            pre[:, G_RID] = canon[other_ids].astype(np.float32)

        # --- triangle-only BVH (pure perf choice; any tree is exact) ------
        mins, maxs = shape_aabbs(scene)
        centers = shape_centers(scene)
        tri_scene_aabbs = (mins[tri_ids], maxs[tri_ids])
        sub = scene.take(jnp.asarray(tri_ids))
        builder = tri_builder or TRI_BUILDER
        if builder == "sah" and self.n_tri:
            from raytracer_tpu.accel.sah import build_sah
            tbvh = build_sah(aabbs=tri_scene_aabbs,
                             centers=centers[tri_ids],
                             leaf_target=SAH_LEAF_TARGET)
        else:
            tbvh = bvh_mod.build_bvh(sub, tri_max_depth,
                                     aabbs=tri_scene_aabbs,
                                     centers=centers[tri_ids])
        lin = linearize(tbvh)
        self.m = lin.num_nodes
        self.m_pad = max(((self.m + 7) // 8) * 8, 8)
        nodes = np.zeros((self.m_pad, 8), np.float32)
        nodes[:self.m, 0:6] = np.asarray(lin.bounds)
        self.nodes = jnp.asarray(nodes)
        self.leaf_start = lin.leaf_start
        self.leaf_count = lin.leaf_count
        self.skip = lin.skip

        # triangle rows in DFS-leaf order. perm is treated as a multiset
        # (duplicate references would be exact — closest-min idempotent —
        # though no current builder emits them; SBVH was measured worse
        # and deleted, see accel/sah.py).
        perm = np.asarray(lin.perm)           # into tri subset
        self.n_tri = int(perm.shape[0])
        gids = tri_ids[perm]                  # global shape ids
        p1 = np.asarray(scene.tri_p1)[gids]
        p2 = np.asarray(scene.tri_p2)[gids]
        p3 = np.asarray(scene.tri_p3)[gids]
        n = np.asarray(scene.plane_normal)[gids]
        pd = np.asarray(scene.plane_d)[gids]
        e1 = p2 - p1
        e2 = p3 - p1
        d00 = (e1 * e1).sum(-1)
        d01 = (e1 * e2).sum(-1)
        d11 = (e2 * e2).sum(-1)
        denom = d00 * d11 - d01 * d01
        safe = np.where(denom == 0, 1.0, denom)
        z = denom == 0
        tri = np.zeros((max(self.n_tri, 1), TRI_W), np.float32)
        if self.n_tri:
            tri[:, T_NX:T_NX + 3] = n
            tri[:, T_PD] = pd
            tri[:, T_E1X:T_E1X + 3] = e1
            tri[:, T_E2X:T_E2X + 3] = e2
            tri[:, T_P1X:T_P1X + 3] = p1
            s0 = (p1 * e1).sum(-1)
            s1 = (p1 * e2).sum(-1)
            r11 = np.where(z, 0.0, d11 / safe)
            r01 = np.where(z, 0.0, d01 / safe)
            r00 = np.where(z, 0.0, d00 / safe)
            tri[:, T_S0] = s0
            tri[:, T_S1] = s1
            tri[:, T_R11] = r11
            tri[:, T_R01] = r01
            tri[:, T_R00] = r00
            # Gram-fused constants (f32 inputs: match update_tri_rows'
            # on-device recompute bit-for-bit)
            r11f, r01f, r00f = (x.astype(np.float32)
                                for x in (r11, r01, r00))
            s0f, s1f = s0.astype(np.float32), s1.astype(np.float32)
            e1f, e2f = e1.astype(np.float32), e2.astype(np.float32)
            tri[:, T_EVX:T_EVX + 3] = (r11f[:, None] * e1f
                                       - r01f[:, None] * e2f)
            tri[:, T_CV] = r11f * s0f - r01f * s1f
            tri[:, T_EWX:T_EWX + 3] = (r00f[:, None] * e2f
                                       - r01f[:, None] * e1f)
            tri[:, T_CW] = r00f * s1f - r01f * s0f
            tri[:, T_GID] = gids.astype(np.float32)
            tri[:, T_MCR:T_MCR + 3] = np.asarray(scene.mat_color)[gids]
            tri[:, T_MKA] = np.asarray(scene.mat_ambient)[gids]
            tri[:, T_MKD] = np.asarray(scene.mat_diffuse)[gids]
            tri[:, T_MKS] = np.asarray(scene.mat_specular)[gids]
            tri[:, T_MKF] = np.asarray(scene.mat_fresnel)[gids]
            tri[:, T_MSH] = np.asarray(scene.mat_shininess)[gids]
            tri[:, T_RID] = canon[gids].astype(np.float32)
        # +TRI_UNROLL guard rows: with TRI_UNROLL = U the unrolled tests
        # may read (masked-off) rows up to st + cnt - 1 + U - 1 past the
        # last triangle; zero rows never intersect and are valid-masked
        # anyway. Padding tracks the LIVE unroll (r5: the +32 constant
        # silently under-padded when U was raised to 48).
        from raytracer_tpu.render import pallas_split as _ps
        guard = max(int(_ps.TRI_UNROLL), 32)
        k_pad = max(((tri.shape[0] + guard + 7) // 8) * 8, 8)
        tri = np.pad(tri, ((0, k_pad - tri.shape[0]), (0, 0)))
        self.tri_rows = jnp.asarray(tri)
        pre_pad = max(((pre.shape[0] + 7) // 8) * 8, 8)
        pre = np.pad(pre, ((0, pre_pad - pre.shape[0]), (0, 0)))
        self.pre_rows = jnp.asarray(pre)
        self.other_idx = jnp.asarray(other_ids)

        # --- static refit metadata (device tri refresh for animations) ---
        # Topology (leaf assignment, skip pointers, perm) stays fixed;
        # update_tri_rows refreshes rows + node boxes on device. Each
        # node's leaves are the leaf nodes in its DFS span [n, skip[n]);
        # perm ranges of a subtree are contiguous by construction.
        starts = np.asarray(lin.leaf_start)
        counts = np.asarray(lin.leaf_count)
        skips = np.asarray(lin.skip)
        leaf_nodes = np.nonzero(counts > 0)[0]
        self.n_leaf = int(leaf_nodes.shape[0])
        leaf_of_perm = np.zeros(max(self.n_tri, 1), np.int32)
        for li, nd in enumerate(leaf_nodes):
            leaf_of_perm[starts[nd]:starts[nd] + counts[nd]] = li
        node_lo = np.zeros(self.m_pad, np.int32)
        node_hi = np.zeros(self.m_pad, np.int32)
        for nd in range(self.m):
            in_span = leaf_nodes[(leaf_nodes >= nd) & (leaf_nodes
                                                       < skips[nd])]
            if in_span.size:
                node_lo[nd] = starts[in_span[0]]
                node_hi[nd] = starts[in_span[-1]] + counts[in_span[-1]]
        self.tri_gids = jnp.asarray(
            gids if self.n_tri else np.zeros(1, np.int32))
        self.tri_leaf_id = jnp.asarray(leaf_of_perm)
        self.leaf_lo = jnp.asarray(starts[leaf_nodes].astype(np.int32)
                                   if self.n_leaf else np.zeros(1, np.int32))
        self.leaf_hi = jnp.asarray(
            (starts[leaf_nodes] + counts[leaf_nodes]).astype(np.int32)
            if self.n_leaf else np.ones(1, np.int32))
        self.node_lo = jnp.asarray(node_lo)
        self.node_hi = jnp.asarray(node_hi)

    def device_args(self):
        return (self.leaf_start, self.leaf_count, self.skip, self.nodes,
                self.pre_rows, self.tri_rows)


def update_pre_rows(split: SplitScene, scene: FlatScene) -> SplitScene:
    """Device-side per-frame refresh of the pre-pass rows, for animations
    that move only NON-triangle shapes (e.g. scene 1's bouncing spheres,
    reference src/main.cpp:939-967): geometry and material columns are
    re-packed from the current scene; the leaf-box gate becomes the
    shape's own current AABB for contained shapes (an exact gate — the
    shape is inside it by construction, mirroring the reference's
    grow-refit keeping moved spheres inside their leaf, main.cpp:1068-77)
    while degenerate walls keep their stored reference-tree box (their
    visibility IS that box, and they never move). Triangle rows and the
    triangle BVH are untouched. Pure jnp: call inside jit once per frame.

    GEOMETRY-ONLY contract: the canonical resolve-id column (G_RID) is
    carried forward unchanged — it is data-dependent grouping that
    cannot be recomputed in-trace. If material VALUES changed since
    prepare(), call ``update_materials`` (host-side) first.
    """
    from raytracer_tpu.core.scene import WALL
    from raytracer_tpu.geom.aabb import shape_aabbs_jnp
    from raytracer_tpu.geom.direct import wall_basis

    if split.n_other == 0:
        return split
    idx = split.other_idx
    rows24 = rowwise.pack_rows(scene)[idx]
    amin, amax = shape_aabbs_jnp(scene)
    _, _, wdeg = wall_basis(scene.plane_normal)
    deg = (wdeg & (scene.shape_type == WALL))[idx][:, None]
    old = split.pre_rows[:split.n_other]
    bmin = jnp.where(deg, old[:, G_B0X:G_B0X + 3], amin[idx])
    bmax = jnp.where(deg, old[:, G_B1X:G_B1X + 3], amax[idx])
    new = jnp.concatenate([
        rows24,
        old[:, G_GID:G_GID + 1],
        bmin, bmax,
        scene.mat_color[idx],
        scene.mat_ambient[idx, None],
        scene.mat_diffuse[idx, None],
        scene.mat_specular[idx, None],
        scene.mat_fresnel[idx, None],
        scene.mat_shininess[idx, None],
        old[:, G_RID:G_RID + 1],
    ], axis=1)
    pad = split.pre_rows.shape[0] - split.n_other
    if pad:
        new = jnp.pad(new, ((0, pad), (0, 0)))
    return split.replace_leaves(pre_rows=new)


def update_tri_rows(split: SplitScene, scene: FlatScene) -> SplitScene:
    """Device-side per-frame refresh of the TRIANGLE side: re-pack
    tri_rows from the current scene (same static perm/leaf order) and
    REFIT the triangle BVH node boxes bottom-up — the device analogue of
    the reference's updateBVH grow-refit (src/main.cpp:1068-1077), for
    animations that move triangles (updateWheelAnimations,
    main.cpp:1084-1109). Topology is static; boxes stay exact unions of
    their leaves' current AABBs, so traversal remains exact (any
    containing tri tree is — see module docstring). Pure jnp: call inside
    jit once per frame.

    Preserves the stale-plane quirk: plane_normal/plane_d columns are
    whatever the scene carries (rotate_wheels leaves them stale by
    default, exactly like serializeShape re-uploading the old plane).

    GEOMETRY-ONLY contract: T_RID is carried forward — see
    ``update_materials`` for material edits."""
    if split.n_tri == 0:
        return split
    gids = split.tri_gids
    p1 = jnp.take(scene.tri_p1, gids, axis=0)
    p2 = jnp.take(scene.tri_p2, gids, axis=0)
    p3 = jnp.take(scene.tri_p3, gids, axis=0)
    n = jnp.take(scene.plane_normal, gids, axis=0)
    pd = jnp.take(scene.plane_d, gids, axis=0)
    e1 = p2 - p1
    e2 = p3 - p1
    d00 = jnp.sum(e1 * e1, -1)
    d01 = jnp.sum(e1 * e2, -1)
    d11 = jnp.sum(e2 * e2, -1)
    denom = d00 * d11 - d01 * d01
    z = denom == 0
    safe = jnp.where(z, 1.0, denom)
    s0 = jnp.sum(p1 * e1, -1)
    s1 = jnp.sum(p1 * e2, -1)
    r11 = jnp.where(z, 0.0, d11 / safe)
    r01 = jnp.where(z, 0.0, d01 / safe)
    r00 = jnp.where(z, 0.0, d00 / safe)
    tri = jnp.concatenate([
        n, pd[:, None],
        e1, e2, p1,
        s0[:, None], s1[:, None],
        r11[:, None], r01[:, None], r00[:, None],
        gids.astype(jnp.float32)[:, None],
        jnp.take(scene.mat_color, gids, axis=0),
        jnp.take(scene.mat_ambient, gids)[:, None],
        jnp.take(scene.mat_diffuse, gids)[:, None],
        jnp.take(scene.mat_specular, gids)[:, None],
        jnp.take(scene.mat_fresnel, gids)[:, None],
        jnp.take(scene.mat_shininess, gids)[:, None],
        split.tri_rows[:split.n_tri, T_RID:T_RID + 1],
        # Gram-fused constants (cfg.use_gram_tri; same f32 ops as prepare())
        r11[:, None] * e1 - r01[:, None] * e2,
        (r11 * s0 - r01 * s1)[:, None],
        r00[:, None] * e2 - r01[:, None] * e1,
        (r00 * s1 - r01 * s0)[:, None],
    ], axis=1)
    pad = split.tri_rows.shape[0] - split.n_tri
    if pad:
        tri = jnp.pad(tri, ((0, pad), (0, 0)))

    # refit: leaf boxes by segment reduce over perm order, node boxes by
    # (small, static) leaf-containment masks
    tmin = jnp.minimum(jnp.minimum(p1, p2), p3)
    tmax = jnp.maximum(jnp.maximum(p1, p2), p3)
    lmin = jax.ops.segment_min(tmin, split.tri_leaf_id,
                               num_segments=split.n_leaf)
    lmax = jax.ops.segment_max(tmax, split.tri_leaf_id,
                               num_segments=split.n_leaf)
    contained = ((split.leaf_lo[None, :] >= split.node_lo[:, None])
                 & (split.leaf_hi[None, :] <= split.node_hi[:, None])
                 & (split.node_hi[:, None] > split.node_lo[:, None]))
    c3 = contained[:, :, None]
    nmin = jnp.min(jnp.where(c3, lmin[None], INF), axis=1)
    nmax = jnp.max(jnp.where(c3, lmax[None], -INF), axis=1)
    nonempty = (split.node_hi > split.node_lo)[:, None]
    nmin = jnp.where(nonempty, nmin, 0.0)
    nmax = jnp.where(nonempty, nmax, 0.0)
    nodes = jnp.concatenate(
        [nmin, nmax, jnp.zeros((split.m_pad, 2), jnp.float32)], axis=1)
    return split.replace_leaves(tri_rows=tri, nodes=nodes)


def update_dynamic(split: SplitScene, scene: FlatScene) -> SplitScene:
    """Full device-side refresh for arbitrary animations: pre-pass rows
    (moved non-triangles) + triangle rows with BVH refit."""
    return update_tri_rows(update_pre_rows(split, scene), scene)


def update_materials(split: SplitScene, scene: FlatScene) -> SplitScene:
    """Host-side refresh after MATERIAL edits (the ImGui live-editor
    analogue — reference src/main.cpp:384-429 edits materials while the
    scene runs): re-packs the material columns of both row tables AND
    recomputes the canonical resolve-id grouping + ``rid_values``, which
    ``prepare()`` froze from the original material 8-tuples. The traced
    per-frame refreshers (``update_pre_rows``/``update_tri_rows``) are
    geometry-only and deliberately carry the old RID columns forward —
    the grouping is data-dependent (``np.unique``), so it cannot be
    recomputed inside jit. Editing a material and skipping this call
    would shade every shape of the stale group with the group
    representative's material (the wholeframe kernel resolves
    ``tab[rid]``). Host-only: requires concrete (non-traced) arrays.

    ``rid_values`` is static kernel metadata, so a structural change to
    the material grouping recompiles the wholeframe kernel — same cost
    class as the reference re-uploading its SSBOs on edit."""
    canon = _canonical_material_ids(scene)
    mc = np.asarray(scene.mat_color)
    ka = np.asarray(scene.mat_ambient)
    kd = np.asarray(scene.mat_diffuse)
    ks = np.asarray(scene.mat_specular)
    kf = np.asarray(scene.mat_fresnel)
    sh = np.asarray(scene.mat_shininess)
    pre = np.asarray(split.pre_rows).copy()
    if split.n_other:
        oidx = np.asarray(split.other_idx)
        pre[:split.n_other, G_MCR:G_MCR + 3] = mc[oidx]
        pre[:split.n_other, G_MKA] = ka[oidx]
        pre[:split.n_other, G_MKD] = kd[oidx]
        pre[:split.n_other, G_MKS] = ks[oidx]
        pre[:split.n_other, G_MKF] = kf[oidx]
        pre[:split.n_other, G_MSH] = sh[oidx]
        pre[:split.n_other, G_RID] = canon[oidx].astype(np.float32)
    tri = np.asarray(split.tri_rows).copy()
    if split.n_tri:
        gids = np.asarray(split.tri_gids)
        tri[:split.n_tri, T_MCR:T_MCR + 3] = mc[gids]
        tri[:split.n_tri, T_MKA] = ka[gids]
        tri[:split.n_tri, T_MKD] = kd[gids]
        tri[:split.n_tri, T_MKS] = ks[gids]
        tri[:split.n_tri, T_MKF] = kf[gids]
        tri[:split.n_tri, T_MSH] = sh[gids]
        tri[:split.n_tri, T_RID] = canon[gids].astype(np.float32)
    new = split.replace_leaves(pre_rows=jnp.asarray(pre),
                               tri_rows=jnp.asarray(tri))
    new.rid_values = tuple(int(v) for v in np.unique(canon))
    return new


# Which builder shapes the triangle-only tree: "median" (reference-
# parity median split, accel/bvh.py) or "sah" (binned surface-area
# heuristic, accel/sah.py). Any tri tree is exact (module docstring).
# v5e A/B at 800x600x3 (bit-exact images): SAH wins BIG on the mesh-
# heavy scene — scene 2: 29.4 -> 20.0 ms (34.0 -> 50.1 FPS), scene 1:
# 8.65 -> 8.05 ms — tighter boxes mean far fewer visited leaves per
# packet walk. leaf_target sweep: 96 best on both scenes (32/64 slightly
# worse; SAH_LEAF_TARGET below).
TRI_BUILDER = "sah"

# SAH leaf size (median builder keeps TRI_LEAF_TARGET above).
# 96 -> 128 in round 5: re-swept with TRI_UNROLL=48 under the final
# kernel (see pallas_split.TRI_UNROLL note).
SAH_LEAF_TARGET = 128


def prepare(scene: FlatScene, ref_bvh: LinearBVH,
            tri_max_depth: int | None = None,
            tri_builder: str | None = None) -> SplitScene:
    return SplitScene(scene, ref_bvh, tri_max_depth, tri_builder)


