"""Split-phase Pallas megakernel: brute non-triangle pre-pass + triangle-
specialized packet BVH traversal. The fastest closest-hit path.

Why splitting is exact (not an approximation):
- For a shape CONTAINED in its BVH leaf box (spheres, triangles, finite
  walls), box gating can never change the result: any ray that hits the
  shape also hits every enclosing box, so the reference's traversal always
  tests it (gpu_shader.comp:380-430). Contained shapes therefore render
  identically under ANY acceleration structure — including none.
- Only degenerate-basis walls (infinite planes, the scene-1 floor quirk)
  extend beyond their leaf box; their visibility IS the reference tree's
  leaf-box hit. They go into the brute pre-pass with their exact
  reference-tree leaf box as a gate.

So: all non-triangles (a handful per scene) are tested brute-force per tile
with per-shape reference leaf-box gates, and triangles — 97% of the scene —
run a lean traversal (plane+barycentric only, ~40 ops vs ~130 for the
type-union body) over a triangle-only BVH whose shape is a pure performance
choice. All nodes of that tree are t-cullable (contents contained).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.accel import bvh as bvh_mod
from raytracer_tpu.accel.linearize import LinearBVH, linearize, \
    shape_leaf_boxes
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene, SPHERE, TRIANGLE
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom import rowwise
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import shading, whitted
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.render.pallas_kernel import _auto_interpret

# Shadow rays via the any-hit occlusion kernel; measured slower than
# closest-hit shadows on v5e in round 1 — keep switchable for re-testing.
USE_OCCLUSION = False

# Emit shading attributes from the kernel (no XLA gathers at all). Off:
# see note in _render_impl.
USE_KERNEL_ATTRS = False

# Resolve shading attributes in a separate post-traversal Pallas kernel
# (_resolve_kernel: loop over the DISTINCT winning shape ids per tile)
# instead of the XLA row gather (measured 3.2ms/wave at 800x600 on v5e —
# half the frame across 3 waves).
USE_RESOLVE_KERNEL = True

# Pruned round-2 (VERDICT item 9) after on-chip measurements:
# - component-SoA pipeline (USE_SOA_PIPELINE/whitted_soa.py): SLOWER
#   (13.0 vs 16.3 FPS) — XLA lays out (R, 3) fine.
# - cond-split state machine (USE_COND_STEP/_cond_kernel): exactly
#   neutral — the loop is iteration-latency bound, so halving the
#   per-iteration vector work changes nothing.
# - SMEM-tables kernel (_split_kernel_smem): 1-ulp correct in interpret
#   mode but the v5e remote Mosaic toolchain compiles it pathologically
#   slowly (>15 min), which also wedges the SHARED compile service —
#   disqualified for production and too risky to keep re-testing.
# - full-Whitted megakernel (pallas_mega.py): exact but 265 ms vs 59 ms —
#   the 12-vector attr carry makes each traversal iteration too fat.
# - ANY-HIT occlusion re-test for the fused kernel's shadow leg (occluded
#   lanes stop probing, beyond-light subtrees culled, optional whole-loop
#   exit once every lane is occluded; bit-exact — closest_t < limit iff
#   some hit t < limit): SLOWER on v5e scene 1 than simply re-running the
#   closest pass, 13.77 vs 13.38 ms/frame (14.45 with the whole-loop
#   exit, whose cross-lane any() adds serial latency every iteration).
# - Morton-grouped sphere pre-pass gated by a conservative per-tile ray-
#   bundle test (union AABB per group of 8/16/32 spheres, lax.cond skip).
#   The straight-line sphere pre-pass costs ~0.18 ms/sphere/frame
#   (measured by scaling scene 1's background-sphere count: 29/16/8/4
#   spheres -> 13.3/12.0/9.6/8.8 ms), and forcing every gate false shows
#   a 7.85 ms floor — but no sound predicate recovered it: an interval/
#   slab direction test degenerates whenever a tile's direction interval
#   straddles 0 on an axis (most tiles), and a bounding-cone test (apex
#   sphere over live origins, mean-direction axis, max-angle aperture vs
#   group bounding sphere) measured 13.89/13.66/13.29 ms at group size
#   8/16/32 vs 13.29 at HEAD — the per-pass cross-lane reductions eat
#   exactly what the skips save (scene 2: 13.48 vs 13.70 FPS, also a
#   wash). The pre-pass cost is origin/direction-diverse bounce+shadow
#   passes, where any whole-tile bundle is too fat to cull.
# - STATIC BRUTE for divergent walks (skip the hierarchy for bounce 2/3
#   rays: a fully unrolled, control-free, tree-reduced pass over all
#   1211 triangles — benchmarks/brute_walk_ab.py): bit-exact but 3.0x
#   SLOWER than the walk on the bounce-2 stream (3.87 vs 1.30 ms). The
#   decisive calibration: the compare/select-heavy intersection mix
#   achieves only ~2.0e9 vreg-ops/s in situ (~15% of the pure-FMA
#   microbenchmark peak), so 'latency-bound iterations whose vector work
#   rides free' stops being true for op counts this large — and at that
#   achieved rate the whole frame's 10.3M vreg-ops are ~5.1 ms, close to
#   the 7.6 ms profiler-measured kernel busy time. The kernel is near
#   its ACHIEVABLE roofline; wins must come from fewer ops.
# - GROUPED one-level walk (replace the tree with ~16 contiguous DFS-
#   span groups: 16 INDEPENDENT slab probes + any()s, then a static
#   lax.cond chain of per-group test blocks — benchmarks/
#   group_walk_ab.py). Rationale: every while iteration costs ~0.29us
#   of serial any->scalar->branch latency (benchmarks/iter_latency.py),
#   so independent probes should pipeline. Measured: +1.9% on the
#   coherent primary stream (fixed per-tile cost dominates there), 0.76x
#   on the divergent bounce-2 stream (testing every probed group's full
#   span loses to hierarchical skipping). Dead end.
# - OCTANT-ORDERED traversal (8 near-child-first DFS linearizations,
#   per-tile majority-sign pick — benchmarks/ordered_walk_eval.py):
#   iteration census shows only 1.1% fewer iterations — packet any-lane
#   semantics visit the union of 2048 lanes' subtrees regardless of
#   order, so earlier t-tightening prunes almost nothing. Dead end.
# - MULTI-STATE lockstep walks (round 4, benchmarks/dual_walk_ab.py):
#   K independent (ptr,k,t,gid) state machines advance K tiles (or K
#   row-slices of one tile) through ONE while loop, overlapping their
#   any()->scalar latencies. All bit-exact; all LOSE: cross-tile K=2/4
#   spill registers (each (16,128) side carries ~24 vregs; 2.4-5x
#   slower), and 2x(8,128) sub-tiles of the SAME tile (flat register
#   cost) still measure ~+20% — the per-side lax.cond machinery costs
#   more than the overlapped latency saves.
# - PROBE-ALL BITMASK walk (round 4, benchmarks/bitmask_walk_ab.py):
#   probe all m node boxes up front (m independent slab tests + any()s,
#   no branches between them -> pipelined), bits to SMEM scratch; the
#   walk then branches on scalar SMEM bits with zero vector work on
#   internal iterations. Exact (probes use the pre-pass t_best, a
#   conservative superset; tightening prunes ~1.1% per the octant
#   census). Measured NEUTRAL on the divergent bounce-2 stream (-2%)
#   and slightly negative on the coherent primary stream: under the
#   leaf-cond walk Mosaic already overlaps the probe/any latency with
#   leaf vector work well enough that removing it buys nothing.
#   Operational lesson from both: stream-level A/B absolute times on
#   this attachment are only comparable WITHIN one quiet process
#   (interleaved min-of-rounds; any concurrent host/TPU work inflates
#   dispatch by 2-3x) — and a per-walk pallas_call pays ~0.9ms of
#   grid/launch floor the production megakernel amortizes over 6 walks.
# - Software-pipelined walk merging for the whole-frame kernel: bounce
#   b's shadow walk and bounce b+1's closest walk are independent (the
#   reflected ray needs the resolved material, not the shadow bit), so
#   both were interleaved into ONE while loop (6 walk phases -> 4, state
#   = 6 vectors + 4 scalars, per-side completion masked at ptr == m).
#   SLOWER: 14.47 vs 11.81 ms/frame on v5e scene 1 — walking the two
#   sides SEPARATELY through the same masked machinery measures 11.87,
#   so the machinery is free and the merge itself is the loss: the walk
#   is now THROUGHPUT-bound (640 masked vector ops per U=16 iteration),
#   and a merged loop runs max(iterA, iterB) iterations of BOTH sides'
#   work — the unbalanced remainder is pure waste. Consistent with the
#   U=32 sweep losing (13.1 ms): per-iteration vector work is no longer
#   hidden under iteration latency at U=16.

# Triangle tests per traversal iteration. The while loop is ITERATION-
# latency bound (A/B: halving per-iteration vector work via USE_COND_STEP
# changed nothing), so testing U triangles per iteration against a
# shallower tree (bigger leaves, see TRI_LEAF_TARGET) cuts iteration
# count near-linearly while the extra vector lanes ride for free.
# v5e sweep (scene 1, 800x600x3): U=16 with ~75-triangle leaves gave
# 47.2 FPS vs 32.4 at U=1/depth-20. Re-swept round 2 under the leaf-cond
# walk (internal iterations skip the U tests entirely, so a bigger U no
# longer taxes them): U=32 on the m=49 tree gives 103 FPS vs 98.8 at
# U=16; U=48 (95.2), U=24 (85.5 — sublane-misaligned), leaf 64 (98.6),
# leaf 192/256 m=25 (100.5), tiles 8x128 (83.2) / 32x128 (99.4) all lose.
TRI_UNROLL = 32

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

# Fully unroll the non-triangle pre-pass fori_loop (same iteration-
# latency argument as TRI_UNROLL; the pre-pass is ~1ms per traversal at
# n_other=31 rolled). Mosaic supports only unroll=1 or full unroll, so
# this is a bool, applied when n_other is small enough to inline.
# v5e A/B: 44.8 -> 47.2 FPS on scene 1 (n_other=31).
PRE_FULL_UNROLL = True


def _pre_unroll(n_other):
    # 128 inlined union-intersect bodies (~8k vector ops) still compile
    # fast; scene 2's 100 spheres fall under this cap
    return n_other if (PRE_FULL_UNROLL and 0 < n_other <= 128) else 1

# Fuse the shadow-ray traversal INTO the closest-hit kernel: one pallas
# launch per bounce instead of two. The kernel finds the closest hit,
# derives the shadow ray in-register (hit point + normal offset, exactly
# whitted.trace's formulas), and runs a second traversal toward the
# light. v5e A/B at TRI_UNROLL=16, tile 16x128: 49.8 -> 51.0 FPS
# (bit-exact); also removes the shadow-ray XLA glue per bounce.
USE_FUSED_SHADOW = True

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
        # +32 guard rows: with TRI_UNROLL = U the unrolled tests may read
        # (masked-off) rows up to st + cnt - 1 + U - 1 past the last
        # triangle; zero rows never intersect and are valid-masked anyway
        k_pad = max(((tri.shape[0] + 32 + 7) // 8) * 8, 8)
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


# Timing probe (not a production path): when set to a host array, the
# pre-pass reads its shape parameters as baked float immediates instead
# of VMEM scalar loads, isolating the cost of scalar->vector broadcast
# loads from the arithmetic. Produces a correct image only while the
# scene matches the baked rows.
CONST_PRE = None


class _ConstRows:
    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return jnp.float32(float(self.arr[idx]))


def _maybe_const(pre_ref):
    if CONST_PRE is None or isinstance(pre_ref, _ConstRows):
        return pre_ref
    return _ConstRows(np.asarray(CONST_PRE))


def _leafbox_gate(pre_ref, i, ox, oy, oz, inv_dx, inv_dy, inv_dz):
    """Reference leaf-box visibility gate of pre-pass shape i (the BVH-clip
    quirk: a shape is only hittable inside its reference-tree leaf box)."""
    tx0 = (pre_ref[i, G_B0X] - ox) * inv_dx
    tx1 = (pre_ref[i, G_B1X] - ox) * inv_dx
    ty0 = (pre_ref[i, G_B0Y] - oy) * inv_dy
    ty1 = (pre_ref[i, G_B1Y] - oy) * inv_dy
    tz0 = (pre_ref[i, G_B0Z] - oz) * inv_dz
    tz1 = (pre_ref[i, G_B1Z] - oz) * inv_dz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                   jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1))
    return (tmax >= tmin) & (tmax > 0)


def _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz, aa):
    """Pre-pass test specialized to SPHERE rows (strict D>0, INNER-only —
    gpu_shader.comp:242-262). The pre rows are grouped by type
    (SplitScene.__init__) so this runs ~17 vector ops instead of the
    ~100-op all-types union.

    NO leaf-box gate: it is provably redundant for spheres. The gate
    passes iff the ray's positive half-line overlaps the box; every box a
    sphere row ever carries CONTAINS the whole sphere (reference median-
    split leaves are unions of member AABBs, main.cpp:1111-1193; the
    update_pre_rows animation path uses the sphere's own current AABB),
    so any t>0 sphere hit lies inside the box and the slab interval
    necessarily straddles it. Infinite walls/planes are the only shapes
    the BVH-clip quirk actually clips — their loop keeps the gate."""
    ocx = ox - pre_ref[i, 1]
    ocy = oy - pre_ref[i, 2]
    ocz = oz - pre_ref[i, 3]
    r = pre_ref[i, 4]
    bb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = bb * bb - 4.0 * aa * cc
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t = (-bb - sq) / (2.0 * aa)
    return t, (disc > 0) & (t > 0)


def _pre_planewall(pre_ref, i, ox, oy, oz, dx, dy, dz,
                   inv_dx, inv_dy, inv_dz):
    """Pre-pass test specialized to the PLANE/WALL family (back-face
    n·dir>0 convention, wall containment, degenerate-basis→infinite-plane
    quirk — gpu_shader.comp:264-328) + leaf-box gate. Pure PLANE rows pack
    v1/v2/s0..s3 as zeros, so the containment test degenerates to
    ``outside == False`` and this is exactly the plane test for them."""
    nx = pre_ref[i, 5]
    ny = pre_ref[i, 6]
    nz = pre_ref[i, 7]
    d_n = dx * nx + dy * ny + dz * nz
    o_n = ox * nx + oy * ny + oz * nz
    t = -(pre_ref[i, 8] + o_n) / jnp.where(d_n == 0, 1.0, d_n)
    v_pl = (d_n > 0) & (t > 0)
    tw = jnp.where(v_pl, t, 0.0)
    hx = ox + tw * dx
    hy = oy + tw * dy
    hz = oz + tw * dz
    u = hx * pre_ref[i, 9] + hy * pre_ref[i, 10] + hz * pre_ref[i, 11] \
        - pre_ref[i, 18]
    v = hx * pre_ref[i, 12] + hy * pre_ref[i, 13] + hz * pre_ref[i, 14] \
        - pre_ref[i, 19]
    outside = (u < 0) | (u > pre_ref[i, 20]) | (v < 0) | (v > pre_ref[i, 21])
    inner = v_pl & ((pre_ref[i, 23] > 0) | ~outside) \
        & _leafbox_gate(pre_ref, i, ox, oy, oz, inv_dx, inv_dy, inv_dz)
    return t, inner


def _tri_test(tri_ref, i, ox, oy, oz, dx, dy, dz, use_mt, use_gram):
    """Lean triangle test (barycentric, gpu_shader.comp:196-240, or MT
    :170-195)."""
    if use_mt:
        e1x = tri_ref[i, T_E1X]
        e1y = tri_ref[i, T_E1Y]
        e1z = tri_ref[i, T_E1Z]
        e2x = tri_ref[i, T_E2X]
        e2y = tri_ref[i, T_E2Y]
        e2z = tri_ref[i, T_E2Z]
        hcx = dy * e2z - dz * e2y
        hcy = dz * e2x - dx * e2z
        hcz = dx * e2y - dy * e2x
        a = e1x * hcx + e1y * hcy + e1z * hcz
        ok = jnp.abs(a) >= 1e-5
        f = 1.0 / jnp.where(ok, a, 1.0)
        smx = ox - tri_ref[i, T_P1X]
        smy = oy - tri_ref[i, T_P1Y]
        smz = oz - tri_ref[i, T_P1Z]
        u = f * (smx * hcx + smy * hcy + smz * hcz)
        ok = ok & (u >= 0) & (u <= 1)
        qx = smy * e1z - smz * e1y
        qy = smz * e1x - smx * e1z
        qz = smx * e1y - smy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (v >= 0) & (u + v <= 1)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        return t, ok & (t > 0)
    nx = tri_ref[i, T_NX]
    ny = tri_ref[i, T_NY]
    nz = tri_ref[i, T_NZ]
    d_n = dx * nx + dy * ny + dz * nz
    o_n = ox * nx + oy * ny + oz * nz
    t = -(tri_ref[i, T_PD] + o_n) / jnp.where(d_n == 0, 1.0, d_n)
    inner = (d_n > 0) & (t > 0)
    if use_gram:
        # v = (o + t d).Ev - cv without forming the hit point (t is
        # always finite — the divide is guarded — so no tw masking).
        # Degenerate triangles (Gram denom 0) keep the raw path's quirk:
        # Ev = Ew = cv = cw = 0 -> v = w = 0, accept == plane INNER.
        d_ev = (dx * tri_ref[i, T_EVX] + dy * tri_ref[i, T_EVY]
                + dz * tri_ref[i, T_EVZ])
        o_ev = (ox * tri_ref[i, T_EVX] + oy * tri_ref[i, T_EVY]
                + oz * tri_ref[i, T_EVZ] - tri_ref[i, T_CV])
        v = o_ev + t * d_ev
        d_ew = (dx * tri_ref[i, T_EWX] + dy * tri_ref[i, T_EWY]
                + dz * tri_ref[i, T_EWZ])
        o_ew = (ox * tri_ref[i, T_EWX] + oy * tri_ref[i, T_EWY]
                + oz * tri_ref[i, T_EWZ] - tri_ref[i, T_CW])
        w = o_ew + t * d_ew
        inner = inner & (v >= 0) & (w >= 0) & ((v + w) <= 1.0)
        return t, inner
    tw = jnp.where(inner, t, 0.0)
    hx = ox + tw * dx
    hy = oy + tw * dy
    hz = oz + tw * dz
    d20 = (hx * tri_ref[i, T_E1X] + hy * tri_ref[i, T_E1Y]
           + hz * tri_ref[i, T_E1Z] - tri_ref[i, T_S0])
    d21 = (hx * tri_ref[i, T_E2X] + hy * tri_ref[i, T_E2Y]
           + hz * tri_ref[i, T_E2Z] - tri_ref[i, T_S1])
    v = tri_ref[i, T_R11] * d20 - tri_ref[i, T_R01] * d21
    w = tri_ref[i, T_R00] * d21 - tri_ref[i, T_R01] * d20
    u = 1.0 - v - w
    inner = inner & ~((u < 0) | (v < 0) | (w < 0))
    return t, inner


# Skip the U triangle tests on internal-node iterations via a scalar
# lax.cond instead of running them masked (retest of the pruned round-1
# cond-split idea now that the walk is throughput-bound).
USE_LEAF_COND = True

# ablation flags for performance bisection (leave True in production)
RUN_PREPASS = True
RUN_TRAVERSAL = True

# Tree-reduce the pre-pass min instead of folding left-to-right. The
# fully-unrolled fold's 29 where-blends form one serial dependence chain
# (each blend waits on the previous t_best) — with the bodies' own math
# free to schedule in parallel, that chain IS the pre-pass latency.
# A balanced pairwise min (left wins exact f32 ties at every level, so
# the earliest-row-wins ordering of the fold is preserved bit-exactly)
# is log2(n) blends deep. v5e scene 1 800x600x3: 13.37 -> 8.9 ms/frame.
PRE_TREE_REDUCE = True

# Tree-reduce the U triangle tests inside a leaf iteration the same way.
# Bit-exact, but measured NEUTRAL on v5e (9.45 ms fold vs 9.56 tree,
# scene 1 800x600x3): unlike the pre-pass, the leaf fold's serial blend
# chain already hides entirely under the walk's ~0.29us/iteration
# control latency (benchmarks/iter_latency.py — iterations cost the
# same with or without their vector work). Kept switchable as the
# documented negative result.
LEAF_TREE_REDUCE = False


def _reduce_candidates(cands):
    """Balanced strict-min reduction of (t, payload...) tuples; on exact
    f32 ties the LEFT (earlier-row) candidate wins, matching a
    left-to-right fold with strict ``t < t_best``."""
    while len(cands) > 1:
        nxt = [tuple(jnp.where(b[0] < a[0], xb, xa)
                     for xa, xb in zip(a, b))
               for a, b in zip(cands[0::2], cands[1::2])]
        if len(cands) & 1:
            nxt.append(cands[-1])
        cands = nxt
    return cands[0]


N_ATTRS = 11  # nx, ny, nz, cr, cg, cb, ka, kd, ks, kf, shininess


def _split_body(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                pre_ref, tri_ref, rays_ref, t_ref, gid_ref,
                *, m, n_other, n_sph, use_mt, use_gram, occlusion, attr_refs=None,
                unroll=1):
    pre_ref = _maybe_const(pre_ref)
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    if occlusion:
        limit = rays_ref[6, 0]          # per-lane light distance
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32)
    g0 = jnp.full(shape, -1.0, jnp.float32)
    emit = attr_refs is not None
    a0 = tuple(jnp.zeros(shape, jnp.float32) for _ in range(N_ATTRS)) \
        if emit else ()

    def pre_attrs(i, t, sphere):
        """Shading attributes of pre-pass shape i at hit t (vectors).
        ``sphere`` is a STATIC per-loop flag (pre rows are grouped by
        type): sphere normals come from the hit point, plane-family
        normals are the stored plane normal — no runtime type blend."""
        if sphere:
            px = ox + t * dx - pre_ref[i, 1]
            py = oy + t * dy - pre_ref[i, 2]
            pz = oz + t * dz - pre_ref[i, 3]
            inv = jax.lax.rsqrt(px * px + py * py + pz * pz + 1e-30)
            nx, ny, nz = px * inv, py * inv, pz * inv
        else:
            nx, ny, nz = pre_ref[i, 5], pre_ref[i, 6], pre_ref[i, 7]
        return (nx, ny, nz, pre_ref[i, G_MCR], pre_ref[i, G_MCG],
                pre_ref[i, G_MCB], pre_ref[i, G_MKA], pre_ref[i, G_MKD],
                pre_ref[i, G_MKS], pre_ref[i, G_MKF], pre_ref[i, G_MSH])

    # ---- pre-pass: non-triangle shapes, brute with leaf-box gates --------
    # Two type-specialized loops over the grouped pre rows (spheres, then
    # the plane family): ~35/~45 vector ops per shape instead of the
    # ~100-op branchless union of every type formula.
    def make_pre_body(sphere):
        def pre_body(i, carry):
            if sphere:
                t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa)
            else:
                t, inner = _pre_planewall(pre_ref, i, ox, oy, oz,
                                          dx, dy, dz,
                                          inv_dx, inv_dy, inv_dz)
            if occlusion:
                t_best, gid_best = carry
                better = inner & (t < limit) & (t_best == INF)
                return (jnp.where(better, 0.0, t_best), gid_best)
            t_best, gid_best = carry[0], carry[1]
            better = inner & (t < t_best)
            out = (jnp.where(better, t, t_best),
                   jnp.where(better, pre_ref[i, G_GID], gid_best))
            if emit:
                new_attrs = pre_attrs(i, t, sphere)
                out = out + tuple(jnp.where(better, na, a)
                                  for na, a in zip(new_attrs, carry[2:]))
            return out
        return pre_body

    def prepass_tests():
        out = []
        for i in range(n_other):
            sphere = i < n_sph
            if sphere:
                t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa)
            else:
                t, inner = _pre_planewall(pre_ref, i, ox, oy, oz,
                                          dx, dy, dz,
                                          inv_dx, inv_dy, inv_dz)
            out.append((i, sphere, t, inner))
        return out

    def run_prepass(carry):
        if not (PRE_TREE_REDUCE and n_other <= 128):
            if n_sph:
                carry = jax.lax.fori_loop(0, n_sph, make_pre_body(True),
                                          carry, unroll=_pre_unroll(n_sph))
            if n_other > n_sph:
                carry = jax.lax.fori_loop(n_sph, n_other,
                                          make_pre_body(False), carry,
                                          unroll=_pre_unroll(n_other
                                                             - n_sph))
            return carry
        tests = prepass_tests()
        if occlusion:
            hits = [inner & (t < limit) for _, _, t, inner in tests]
            while len(hits) > 1:
                pairs = [a | b for a, b in zip(hits[0::2], hits[1::2])]
                hits = pairs + ([hits[-1]] if len(hits) & 1 else [])
            return (jnp.where(hits[0], 0.0, carry[0]), carry[1])
        cands = []
        for i, sphere, t, inner in tests:
            payload = (jnp.where(inner, t, INF), pre_ref[i, G_GID])
            if emit:
                payload = payload + pre_attrs(i, t, sphere)
            cands.append(payload)
        best = _reduce_candidates(cands)
        better = best[0] < carry[0]
        return tuple(jnp.where(better, nb, c)
                     for nb, c in zip(best, carry))

    init = (t0, g0) if occlusion else (t0, g0) + a0

    # ---- triangle packet traversal ---------------------------------------
    def cond(state):
        return state[0] < m

    def body(state):
        ptr, k, t_best, gid_best = state[0], state[1], state[2], state[3]
        attrs = state[4:]
        entering = k == 0

        def probe_node(_):
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
            if occlusion:
                # lanes already occluded never probe; subtree can occlude
                # only if its entry t is under the light distance
                probe = ((tmax >= tmin) & (tmax > 0) & (t_best != 0.0)
                         & (tmin <= limit))
            else:
                # every triangle is contained: t-culling is always safe
                probe = (tmax >= tmin) & (tmax > 0) & (tmin <= t_best)
            return jnp.any(probe)

        if USE_LEAF_COND:
            # mid-leaf iterations never consume the slab test (see
            # _closest_pass.body)
            any_hit = jax.lax.cond(entering, probe_node,
                                   lambda _: jnp.bool_(False), 0)
        else:
            any_hit = probe_node(0)

        st = leaf_start_ref[ptr]
        cnt = leaf_count_ref[ptr]
        sk = skip_ref[ptr]
        is_leaf = cnt > 0

        start_leaf = entering & any_hit & is_leaf
        in_leaf = start_leaf | jnp.logical_not(entering)

        def leaf_tests(carry):
            t_best, gid_best = carry[0], carry[1]
            attrs = carry[2:]
            if LEAF_TREE_REDUCE and not emit:
                if occlusion:
                    hits = []
                    for j in range(unroll):
                        row = st + k + j
                        t, inner = _tri_test(tri_ref, row, ox, oy, oz,
                                             dx, dy, dz, use_mt, use_gram)
                        h = inner & (t < limit)
                        hits.append(h if j == 0 else h & ((k + j) < cnt))
                    while len(hits) > 1:
                        pairs = [a | b for a, b in zip(hits[0::2],
                                                       hits[1::2])]
                        hits = pairs + ([hits[-1]] if len(hits) & 1
                                        else [])
                    return (jnp.where(hits[0], 0.0, t_best),
                            gid_best) + attrs
                cands = []
                for j in range(unroll):
                    row = st + k + j
                    t, inner = _tri_test(tri_ref, row, ox, oy, oz,
                                         dx, dy, dz, use_mt, use_gram)
                    ok = inner if j == 0 else inner & ((k + j) < cnt)
                    cands.append((jnp.where(ok, t, INF),
                                  tri_ref[row, T_GID]))
                best = _reduce_candidates(cands)
                better = best[0] < t_best
                return (jnp.where(better, best[0], t_best),
                        jnp.where(better, best[1], gid_best)) + attrs
            for j in range(unroll):
                row = st + k + j
                valid = ((k + j) < cnt) if j else None
                t, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                     use_mt, use_gram)
                if occlusion:
                    hit_now = inner & (t < limit)
                    if j:
                        hit_now = hit_now & valid
                    t_best = jnp.where(hit_now, 0.0, t_best)
                else:
                    better = inner & (t < t_best)
                    if j:
                        better = better & valid
                    t_best = jnp.where(better, t, t_best)
                    gid_best = jnp.where(better, tri_ref[row, T_GID],
                                         gid_best)
                    if emit:
                        tri_attrs = (tri_ref[row, T_NX],
                                     tri_ref[row, T_NY],
                                     tri_ref[row, T_NZ],
                                     tri_ref[row, T_MCR],
                                     tri_ref[row, T_MCG],
                                     tri_ref[row, T_MCB],
                                     tri_ref[row, T_MKA],
                                     tri_ref[row, T_MKD],
                                     tri_ref[row, T_MKS],
                                     tri_ref[row, T_MKF],
                                     tri_ref[row, T_MSH])
                        attrs = tuple(jnp.where(better, na, a)
                                      for na, a in zip(tri_attrs, attrs))
            return (t_best, gid_best) + attrs

        if USE_LEAF_COND:
            carry = jax.lax.cond(in_leaf, leaf_tests, lambda c: c,
                                 (t_best, gid_best) + attrs)
            t_best, gid_best = carry[0], carry[1]
            attrs = carry[2:]
        else:
            for j in range(unroll):
                row = st + k + j
                valid = (k + j) < cnt if j else in_leaf
                if j:
                    valid = valid & in_leaf
                t, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                     use_mt, use_gram)
                if occlusion:
                    hit_now = inner & valid & (t < limit)
                    t_best = jnp.where(hit_now, 0.0, t_best)
                else:
                    better = inner & valid & (t < t_best)
                    t_best = jnp.where(better, t, t_best)
                    gid_best = jnp.where(better, tri_ref[row, T_GID],
                                         gid_best)
                    if emit:
                        tri_attrs = (tri_ref[row, T_NX],
                                     tri_ref[row, T_NY],
                                     tri_ref[row, T_NZ],
                                     tri_ref[row, T_MCR],
                                     tri_ref[row, T_MCG],
                                     tri_ref[row, T_MCB],
                                     tri_ref[row, T_MKA],
                                     tri_ref[row, T_MKD],
                                     tri_ref[row, T_MKS],
                                     tri_ref[row, T_MKF],
                                     tri_ref[row, T_MSH])
                        attrs = tuple(jnp.where(better, na, a)
                                      for na, a in zip(tri_attrs, attrs))

        k_next = k + unroll
        leaf_done = in_leaf & (k_next >= cnt)
        go_deeper = entering & any_hit & jnp.logical_not(is_leaf)
        stay = (in_leaf & jnp.logical_not(leaf_done)).astype(jnp.int32)
        deeper = go_deeper.astype(jnp.int32)
        new_ptr = stay * ptr + (1 - stay) * (deeper * (ptr + 1)
                                             + (1 - deeper) * sk)
        new_k = stay * k_next
        return (new_ptr, new_k, t_best, gid_best) + attrs

    def write_attrs(attrs):
        if emit:
            for ref, a in zip(attr_refs, attrs):
                ref[0] = a

    def run_all(carry):
        """Pre-pass + packet traversal. Wrapped in ONE liveness cond so an
        all-parked tile (bounce waves 2/3, all-miss shadow tiles) does ZERO
        vector work — the ungated while loop still burned a full first
        iteration (node-0 probe + U masked triangle tests) per launch,
        a measured ~2ms/launch floor across the 235-tile grid."""
        if n_other and RUN_PREPASS:
            carry = run_prepass(carry)
        if not RUN_TRAVERSAL:
            return carry
        if occlusion:
            t_occ = jnp.where(carry[0] != INF, 0.0, INF)
            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), t_occ, carry[1]))
            return (out[2], out[3])
        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0)) + carry)
        return out[2:]

    # Parked-branch defaults are exactly the miss/unoccluded outputs
    # (t=INF, gid=-1, zero attrs), so skipping is semantics-preserving.
    res = jax.lax.cond(jnp.any(ox < 1e30), run_all, lambda c: c, init)
    t_ref[0] = res[0]
    gid_ref[0] = g0 if occlusion else res[1]
    write_attrs(res[2:])


def _closest_pass(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                  pre_ref, tri_ref, ox, oy, oz, dx, dy, dz,
                  *, m, n_other, n_sph, use_mt, use_gram, with_normals, unroll=1,
                  rid=False):
    pre_ref = _maybe_const(pre_ref)
    """One full closest-hit traversal (pre-pass + triangle packet walk) as
    a pure function of ray components, callable multiple times per kernel
    body. Mirrors _split_body's closest branch exactly (including the
    TRI_UNROLL batched triangle tests); with_normals additionally carries
    the hit normal (3 extra vector carries) so the caller can derive
    secondary rays in-register. rid=True carries the canonical resolve id
    (T_RID/G_RID) instead of the true gid — exact for material resolve
    only (see the T_RID note), used by the wholeframe kernel."""
    tcol = T_RID if rid else T_GID
    pcol = G_RID if rid else G_GID
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32)
    g0 = jnp.full(shape, -1.0, jnp.float32)
    n0 = tuple(jnp.zeros(shape, jnp.float32) for _ in range(3)) \
        if with_normals else ()

    def pre_normal(i, t, sphere):
        # sphere normal from the hit point, plane-family from the stored
        # normal — static per-loop flag, no runtime type blend
        if sphere:
            px = ox + t * dx - pre_ref[i, 1]
            py = oy + t * dy - pre_ref[i, 2]
            pz = oz + t * dz - pre_ref[i, 3]
            inv = jax.lax.rsqrt(px * px + py * py + pz * pz + 1e-30)
            return px * inv, py * inv, pz * inv
        return pre_ref[i, 5], pre_ref[i, 6], pre_ref[i, 7]

    def make_pre_body(sphere):
        def pre_body(i, carry):
            if sphere:
                t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa)
            else:
                t, inner = _pre_planewall(pre_ref, i, ox, oy, oz,
                                          dx, dy, dz,
                                          inv_dx, inv_dy, inv_dz)
            t_best, gid_best = carry[0], carry[1]
            better = inner & (t < t_best)
            out = (jnp.where(better, t, t_best),
                   jnp.where(better, pre_ref[i, pcol], gid_best))
            if with_normals:
                out = out + tuple(jnp.where(better, nv, c) for nv, c in
                                  zip(pre_normal(i, t, sphere), carry[2:]))
            return out
        return pre_body

    def run_prepass(carry):
        if not (PRE_TREE_REDUCE and n_other <= 128):
            if n_sph:
                carry = jax.lax.fori_loop(0, n_sph, make_pre_body(True),
                                          carry, unroll=_pre_unroll(n_sph))
            if n_other > n_sph:
                carry = jax.lax.fori_loop(n_sph, n_other,
                                          make_pre_body(False), carry,
                                          unroll=_pre_unroll(n_other
                                                             - n_sph))
            return carry
        cands = []
        for i in range(n_other):
            sphere = i < n_sph
            if sphere:
                t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa)
            else:
                t, inner = _pre_planewall(pre_ref, i, ox, oy, oz,
                                          dx, dy, dz,
                                          inv_dx, inv_dy, inv_dz)
            payload = (jnp.where(inner, t, INF), pre_ref[i, pcol])
            if with_normals:
                payload = payload + pre_normal(i, t, sphere)
            cands.append(payload)
        best = _reduce_candidates(cands)
        better = best[0] < carry[0]
        return tuple(jnp.where(better, nb, c)
                     for nb, c in zip(best, carry))

    init = (t0, g0) + n0

    def cond(state):
        return state[0] < m

    def body(state):
        ptr, k, t_best, gid_best = state[0], state[1], state[2], state[3]
        nrm = state[4:]
        entering = k == 0

        def probe_node(_):
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
            probe = (tmax >= tmin) & (tmax > 0) & (tmin <= t_best)
            return jnp.any(probe)

        if USE_LEAF_COND:
            # mid-leaf iterations (k > 0) never consume the slab test:
            # start_leaf and go_deeper are both gated on `entering`
            any_hit = jax.lax.cond(entering, probe_node,
                                   lambda _: jnp.bool_(False), 0)
        else:
            any_hit = probe_node(0)

        st = leaf_start_ref[ptr]
        cnt = leaf_count_ref[ptr]
        sk = skip_ref[ptr]
        is_leaf = cnt > 0
        start_leaf = entering & any_hit & is_leaf
        in_leaf = start_leaf | jnp.logical_not(entering)

        def leaf_tests(carry):
            t_best, gid_best = carry[0], carry[1]
            nrm = carry[2:]
            if LEAF_TREE_REDUCE:
                cands = []
                for j in range(unroll):
                    row = st + k + j
                    t, inner = _tri_test(tri_ref, row, ox, oy, oz,
                                         dx, dy, dz, use_mt, use_gram)
                    ok = inner if j == 0 else inner & ((k + j) < cnt)
                    payload = (jnp.where(ok, t, INF),
                               tri_ref[row, tcol])
                    if with_normals:
                        payload = payload + (tri_ref[row, T_NX],
                                             tri_ref[row, T_NY],
                                             tri_ref[row, T_NZ])
                    cands.append(payload)
                best = _reduce_candidates(cands)
                better = best[0] < t_best
                out = tuple(jnp.where(better, nb, c) for nb, c in
                            zip(best, (t_best, gid_best) + nrm))
                return out
            for j in range(unroll):
                row = st + k + j
                valid = True if j == 0 else (k + j) < cnt
                t, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                     use_mt, use_gram)
                better = inner & valid & (t < t_best) if j \
                    else inner & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                gid_best = jnp.where(better, tri_ref[row, tcol], gid_best)
                if with_normals:
                    tri_n = (tri_ref[row, T_NX], tri_ref[row, T_NY],
                             tri_ref[row, T_NZ])
                    nrm = tuple(jnp.where(better, nv, c)
                                for nv, c in zip(tri_n, nrm))
            return (t_best, gid_best) + nrm

        if USE_LEAF_COND:
            # internal-node iterations skip the U triangle tests entirely
            # (scalar branch) instead of running them masked
            carry = jax.lax.cond(in_leaf, leaf_tests, lambda c: c,
                                 (t_best, gid_best) + nrm)
            t_best, gid_best = carry[0], carry[1]
            nrm = carry[2:]
        else:
            for j in range(unroll):
                row = st + k + j
                valid = in_leaf if j == 0 else ((k + j) < cnt) & in_leaf
                t, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                     use_mt, use_gram)
                better = inner & valid & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                gid_best = jnp.where(better, tri_ref[row, tcol],
                                     gid_best)
                if with_normals:
                    tri_n = (tri_ref[row, T_NX], tri_ref[row, T_NY],
                             tri_ref[row, T_NZ])
                    nrm = tuple(jnp.where(better, nv, c)
                                for nv, c in zip(tri_n, nrm))

        k_next = k + unroll
        leaf_done = in_leaf & (k_next >= cnt)
        go_deeper = entering & any_hit & jnp.logical_not(is_leaf)
        stay = (in_leaf & jnp.logical_not(leaf_done)).astype(jnp.int32)
        deeper = go_deeper.astype(jnp.int32)
        new_ptr = stay * ptr + (1 - stay) * (deeper * (ptr + 1)
                                             + (1 - deeper) * sk)
        new_k = stay * k_next
        return (new_ptr, new_k, t_best, gid_best) + nrm

    def run_all(carry):
        # pre-pass + packet walk under ONE liveness cond: an all-parked
        # tile (bounce waves 2/3, all-miss shadow passes) does zero
        # vector work — see _split_body.run_all
        if n_other and RUN_PREPASS:
            carry = run_prepass(carry)
        if not RUN_TRAVERSAL:
            return carry
        out = jax.lax.while_loop(cond, body,
                                 (jnp.int32(0), jnp.int32(0)) + carry)
        return out[2:]

    return jax.lax.cond(jnp.any(ox < 1e30), run_all, lambda c: c, init)


def _fused_kernel(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                  pre_ref, tri_ref, rays_ref, t_ref, gid_ref, sh_ref,
                  *, m, n_other, n_sph, use_mt, use_gram, shadow_eps, unroll=1):
    """Closest hit + shadow occlusion in ONE launch. Ray rows 0-5 are the
    primary ray; rows 6-8 broadcast the light position. The shadow ray is
    derived exactly as whitted.trace does (origin p + n*shadow_eps,
    direction normalize(light-p, eps=1e-30)); lanes that missed are parked
    so the second traversal exits immediately. Emits (t, gid, in_shadow)."""
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    lx = rays_ref[6, 0]
    ly = rays_ref[7, 0]
    lz = rays_ref[8, 0]

    t, gid, nx, ny, nz = _closest_pass(
        leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref, pre_ref,
        tri_ref, ox, oy, oz, dx, dy, dz,
        m=m, n_other=n_other, n_sph=n_sph, use_mt=use_mt, use_gram=use_gram,
        with_normals=True, unroll=unroll)

    hit = t < INF
    ts = jnp.where(hit, t, 0.0)
    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz
    ldx = lx - px
    ldy = ly - py
    ldz = lz - pz
    dist = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
    inv = 1.0 / jnp.maximum(dist, 1e-30)   # normalize(.., eps=1e-30)
    sox = jnp.where(hit, px + nx * shadow_eps, whitted.PARK_ORIGIN)
    soy = jnp.where(hit, py + ny * shadow_eps, whitted.PARK_ORIGIN)
    soz = jnp.where(hit, pz + nz * shadow_eps, whitted.PARK_ORIGIN)
    sdx = jnp.where(hit, ldx * inv, whitted._PARK_DIR)
    sdy = jnp.where(hit, ldy * inv, whitted._PARK_DIR)
    sdz = jnp.where(hit, ldz * inv, whitted._PARK_DIR)
    limit = jnp.where(hit, dist, 0.0)

    st, _ = _closest_pass(
        leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref, pre_ref,
        tri_ref, sox, soy, soz, sdx, sdy, sdz,
        m=m, n_other=n_other, n_sph=n_sph, use_mt=use_mt, use_gram=use_gram,
        with_normals=False, unroll=unroll)

    t_ref[0] = t
    gid_ref[0] = gid
    sh_ref[0] = (st < limit).astype(jnp.float32)


# Whole-frame megakernel, round-2 design (VERDICT item 2's stated lead):
# the ENTIRE Whitted bounce loop runs in ONE pallas launch per frame.
# Traversal carries only (t, gid, normal) — the round-1 megakernel died
# carrying 12 attribute vectors through the walk — and materials are
# resolved AFTER each traversal with the _resolve_kernel trick (loop over
# the tile's distinct winning shape ids, accumulating into VMEM scratch
# under disjoint masks; the while carries ONE f32 vector). Kills all
# per-bounce XLA glue: ray re-blocking, phong/reflection elementwise
# passes, and 5 of the 6 kernel launches (+ their grid sweeps).
USE_WHOLEFRAME = True

# Static material resolve (see _wholeframe_kernel): unroll over the
# prepare()-time distinct canonical ids instead of the distinct-id while
# loop. Caps at 128 ids — beyond that the unrolled vector work stops
# being obviously cheaper than the loop's syncs.
USE_STATIC_RESOLVE = True
STATIC_RESOLVE_MAX = 128

# Generate primary rays + background INSIDE the wholeframe kernel from
# the tile's pixel iota and 14 camera scalars, instead of feeding
# XLA-built (9, g, th, tw) ray blocks. The XLA raygen pipeline
# (camera_rays + three to_blocks relayouts + bg broadcast) measures
# ~3.8 ms/frame standalone at 800x600 on v5e (benchmarks/
# profile_waves.py 'raygen_blocks') — the single largest non-kernel
# cost. Formulas mirror core/camera.get_rays + pixel_ndc and
# shading.background term by term.
USE_KERNEL_RAYGEN = True

# attr-table columns consumed by the in-kernel resolve (whitted._attr_table)
_TAB_MAT_COLS = (3, 4, 5, 6, 7, 8, 9, 10)  # color rgb, ka, kd, ks, kf, shin


def _wholeframe_kernel(leaf_start_ref, leaf_count_ref, skip_ref,
                       nodes_ref, pre_ref, tri_ref, tab_ref, par_ref,
                       rays_ref, accr_ref, accg_ref, accb_ref,
                       *extra,
                       m, n_other, n_sph, use_mt, use_gram, bounces, shadow_eps,
                       reflect_eps, use_fresnel, enable_shadows,
                       unroll=1, rid_values=None, raygen=None,
                       emit_state=False, consume_state=False,
                       consume_geom=None):
    """One tile's full Whitted trace (whitted.trace, bounce-unrolled).
    rays rows: o(3), d(3), bg(3). par (1, 24): light pos(3) + color(3)
    [+ camera pos/front/right/up (12), half_w, half_h when raygen].
    extra = optional state out-refs (see below) then 8 (th, tw) VMEM
    scratch accumulators for the resolved material columns. Shading math
    mirrors whitted.trace/shading.phong term by term
    (gpu_shader.comp:331-361, 433-517). With raygen=(W, H, th, tw,
    n_bw), rays_ref is None and primary rays + background are generated
    from the tile's pixel iota (core/camera.get_rays + pixel_ndc +
    shading.background, mirrored term by term).

    HYBRID SORTED-CONTINUATION mode (cfg.sort_bounces — see
    _render_impl): the frame is split at the first bounce boundary so
    the divergent continuation rays can be re-packed into coherent
    tiles by an XLA payload sort between two launches.
    - emit_state: after the ``bounces`` loop, ALSO write the
      continuation state o(3), d(3), atten(3) to 9 extra out-refs.
    - consume_state: rays rows are o(3), d(3), atten(3), ret(1) — ret
      is the ORIGINAL blocked pixel index (f32-exact, < 2^24), which
      already rides the payload sort for the final un-sort; the
      per-pixel background is re-derived from it in-kernel via
      consume_geom = (h_img, tile_sz, bh, bw, n_bw) with bit-identical
      arithmetic to the XLA background (same y/h + lerp op order), so
      misses composite exactly like the normal path while the sort
      carries 3 fewer payload columns (~1 ms/3-4 columns at 506K
      rows)."""
    n_state = 9 if emit_state else 0
    state_refs = extra[:n_state]
    scratch = extra[n_state:]
    lx = par_ref[0, 0]
    ly = par_ref[0, 1]
    lz = par_ref[0, 2]
    lcr = par_ref[0, 3]
    lcg = par_ref[0, 4]
    lcb = par_ref[0, 5]
    if raygen is not None:
        # Pixel coords of this tile's lanes. The image is cut into
        # (bh, bw) square-ish blocks (spatial locality, _block_shape);
        # each block's bh*bw rays are laid out row-major into the
        # (th, tw) VMEM tile. bw and tw are powers of two, so the
        # f32 div/mod below are exact (all ints < 2^24).
        w_img, h_img, bh, bw, th, tw, n_bw = raygen
        i = pl.program_id(0)
        y0 = ((i // n_bw) * bh).astype(jnp.float32)
        x0 = ((i % n_bw) * bw).astype(jnp.float32)
        # int32 iota (Mosaic rejects f32 tpu.iota), then exact f32 convert
        a = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
            .astype(jnp.float32)
        b = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) \
            .astype(jnp.float32)
        rr = a * float(tw) + b          # ray index within the block
        row = jnp.floor(rr / float(bw))
        col = rr - row * float(bw)
        # par[0,20]: pixel-row offset of this kernel's WINDOW within the
        # full image (0 for a whole-frame launch; dev*strip_h under the
        # sharded strip decomposition — parallel/sharding.py). Added
        # before the NDC/background math so every shard generates its
        # strip's true global rays.
        yi = y0 + row + par_ref[0, 20]
        xi = x0 + col
        ndc_x = 2.0 * xi / float(w_img) - 1.0
        ndc_y = 1.0 - 2.0 * yi / float(h_img)
        cpx = par_ref[0, 6]
        cpy = par_ref[0, 7]
        cpz = par_ref[0, 8]
        fx_ = par_ref[0, 9]
        fy_ = par_ref[0, 10]
        fz_ = par_ref[0, 11]
        rx_ = par_ref[0, 12]
        ry_ = par_ref[0, 13]
        rz_ = par_ref[0, 14]
        ux_ = par_ref[0, 15]
        uy_ = par_ref[0, 16]
        uz_ = par_ref[0, 17]
        half_w = par_ref[0, 18]
        half_h = par_ref[0, 19]
        # plane_point - position, exactly get_rays' op order
        vx = (cpx + fx_ + ndc_x * half_w * rx_ + ndc_y * half_h * ux_) \
            - cpx
        vy = (cpy + fy_ + ndc_x * half_w * ry_ + ndc_y * half_h * uy_) \
            - cpy
        vz = (cpz + fz_ + ndc_x * half_w * rz_ + ndc_y * half_h * uz_) \
            - cpz
        nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        valid = (xi < float(w_img)) & (yi < float(h_img))
        ox = jnp.where(valid, cpx, whitted.PARK_ORIGIN)
        oy = jnp.where(valid, cpy, whitted.PARK_ORIGIN)
        oz = jnp.where(valid, cpz, whitted.PARK_ORIGIN)
        dx = jnp.where(valid, vx / nrm, whitted._PARK_DIR)
        dy = jnp.where(valid, vy / nrm, whitted._PARK_DIR)
        dz = jnp.where(valid, vz / nrm, whitted._PARK_DIR)
        f_bg = yi / float(h_img)
        bgr = shading.BG_DARK[0] + (shading.BG_SKY[0]
                                    - shading.BG_DARK[0]) * f_bg
        bgg = shading.BG_DARK[1] + (shading.BG_SKY[1]
                                    - shading.BG_DARK[1]) * f_bg
        bgb = shading.BG_DARK[2] + (shading.BG_SKY[2]
                                    - shading.BG_DARK[2]) * f_bg
    else:
        ox = rays_ref[0, 0]
        oy = rays_ref[1, 0]
        oz = rays_ref[2, 0]
        dx = rays_ref[3, 0]
        dy = rays_ref[4, 0]
        dz = rays_ref[5, 0]
        if consume_state:
            # continuation: rows 6-8 are attenuation, row 9 the original
            # blocked pixel index; bg is re-derived from it (docstring)
            atr = rays_ref[6, 0]
            atg = rays_ref[7, 0]
            atb = rays_ref[8, 0]
            retf = rays_ref[9, 0]
            h_img, tile_sz, bh, bw, n_bw = consume_geom
            tile_id = jnp.floor(retf / float(tile_sz))
            rr = retf - tile_id * float(tile_sz)
            by = jnp.floor(tile_id / float(n_bw))
            # ret is window-local; par[0,20] re-globalizes the pixel row
            # (see the raygen branch) so strip shards derive the same
            # background as a whole-frame launch
            row = jnp.floor(rr / float(bw))
            yi = by * float(bh) + row + par_ref[0, 20]
            f_bg = yi / float(h_img)
            bgr = shading.BG_DARK[0] + (shading.BG_SKY[0]
                                        - shading.BG_DARK[0]) * f_bg
            bgg = shading.BG_DARK[1] + (shading.BG_SKY[1]
                                        - shading.BG_DARK[1]) * f_bg
            bgb = shading.BG_DARK[2] + (shading.BG_SKY[2]
                                        - shading.BG_DARK[2]) * f_bg
        else:
            bgr = rays_ref[6, 0]
            bgg = rays_ref[7, 0]
            bgb = rays_ref[8, 0]

    zero = jnp.zeros_like(ox)
    one = jnp.ones_like(ox)
    accr = accg = accb = zero
    if not consume_state:
        atr = atg = atb = one
    alive = ox < 1e30  # primary rays are live unless padding-parked

    closest = functools.partial(
        _closest_pass, leaf_start_ref, leaf_count_ref, skip_ref,
        nodes_ref, pre_ref, tri_ref,
        m=m, n_other=n_other, n_sph=n_sph, use_mt=use_mt, use_gram=use_gram, unroll=unroll,
        rid=True)  # gid only feeds the material resolve here (T_RID note)

    for _ in range(bounces):
        t, gid, nx, ny, nz = closest(ox, oy, oz, dx, dy, dz,
                                     with_normals=True)
        hit = t < INF
        miss_now = alive & ~hit
        accr = accr + jnp.where(miss_now, atr * bgr, 0.0)
        accg = accg + jnp.where(miss_now, atg * bgg, 0.0)
        accb = accb + jnp.where(miss_now, atb * bgb, 0.0)
        live = alive & hit

        ts = jnp.where(hit, t, 0.0)
        px = ox + ts * dx
        py = oy + ts * dy
        pz = oz + ts * dz

        # shadow leg — formulas verbatim from _fused_kernel
        ldx = lx - px
        ldy = ly - py
        ldz = lz - pz
        dist = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
        if enable_shadows:
            inv = 1.0 / jnp.maximum(dist, 1e-30)
            sox = jnp.where(hit, px + nx * shadow_eps, whitted.PARK_ORIGIN)
            soy = jnp.where(hit, py + ny * shadow_eps, whitted.PARK_ORIGIN)
            soz = jnp.where(hit, pz + nz * shadow_eps, whitted.PARK_ORIGIN)
            sdx = jnp.where(hit, ldx * inv, whitted._PARK_DIR)
            sdy = jnp.where(hit, ldy * inv, whitted._PARK_DIR)
            sdz = jnp.where(hit, ldz * inv, whitted._PARK_DIR)
            limit = jnp.where(hit, dist, 0.0)
            st, _ = closest(sox, soy, soz, sdx, sdy, sdz,
                            with_normals=False)
            in_shadow = st < limit
        else:
            in_shadow = jnp.zeros_like(hit)

        # material resolve. STATIC path: the distinct canonical resolve
        # ids are known at prepare() time (SplitScene.rid_values), so the
        # resolve is a static unroll of (gid == r) masked accumulations
        # with STATIC table indices — pure vector work, zero cross-lane
        # syncs. Fallback: the distinct-id while loop (_resolve_kernel
        # trick), which pays a cross-lane min + any PER ITERATION.
        if rid_values is not None:
            cols = [zero] * len(_TAB_MAT_COLS)
            for r in rid_values:
                mf = (gid == float(r)).astype(jnp.float32)
                cols = [c + mf * tab_ref[r, col]
                        for c, col in zip(cols, _TAB_MAT_COLS)]
            mcr, mcg, mcb, ka, kd, ks, kf, shin = cols
        else:
            for ref in scratch:
                ref[...] = zero

            def rcond(u):
                return jnp.any(u > 0.0)

            def rbody(u):
                s = jnp.min(jnp.where(u > 0.0, gid, 3.4e38))
                si = s.astype(jnp.int32)
                mf = (gid == s).astype(jnp.float32) * u
                for ref, col in zip(scratch, _TAB_MAT_COLS):
                    ref[...] = ref[...] + mf * tab_ref[si, col]
                return u - mf

            jax.lax.while_loop(rcond, rbody, hit.astype(jnp.float32))
            mcr = scratch[0][...]
            mcg = scratch[1][...]
            mcb = scratch[2][...]
            ka = scratch[3][...]
            kd = scratch[4][...]
            ks = scratch[5][...]
            kf = scratch[6][...]
            shin = scratch[7][...]

        # phong (shading.phong, attenuate=True): term order preserved
        dist_p = jnp.sqrt(jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz,
                                      1e-30))
        lc_r = lcr / dist_p
        lc_g = lcg / dist_p
        lc_b = lcb / dist_p
        ldnx = ldx / dist_p
        ldny = ldy / dist_p
        ldnz = ldz / dist_p
        diff = jnp.maximum(nx * ldnx + ny * ldny + nz * ldnz, 0.0)
        # reflect(-light_dir, n) = -ld + 2*(ld.n)*n
        dotln = nx * ldnx + ny * ldny + nz * ldnz
        rdx = -ldnx + 2.0 * dotln * nx
        rdy = -ldny + 2.0 * dotln * ny
        rdz = -ldnz + 2.0 * dotln * nz
        spec_cos = jnp.maximum(dx * rdx + dy * rdy + dz * rdz, 0.0)
        spec = jnp.power(spec_cos, shin)
        specc = jnp.where(diff > 0, ks * spec, 0.0)
        col_r = (ka * lc_r + (kd * diff) * lc_r + specc * lc_r) * mcr
        col_g = (ka * lc_g + (kd * diff) * lc_g + specc * lc_g) * mcg
        col_b = (ka * lc_b + (kd * diff) * lc_b + specc * lc_b) * mcb
        sf = jnp.float32(shading.SHADOW_FACTOR)
        col_r = jnp.where(in_shadow, col_r * sf, col_r)
        col_g = jnp.where(in_shadow, col_g * sf, col_g)
        col_b = jnp.where(in_shadow, col_b * sf, col_b)
        accr = accr + jnp.where(live, atr * col_r, 0.0)
        accg = accg + jnp.where(live, atg * col_g, 0.0)
        accb = accb + jnp.where(live, atb * col_b, 0.0)

        # reflection (gpu_shader.comp:495-516)
        spec_pos = ks > 0
        dotdn = nx * dx + ny * dy + nz * dz
        ndx = dx - 2.0 * dotdn * nx
        ndy = dy - 2.0 * dotdn * ny
        ndz = dz - 2.0 * dotdn * nz
        nox = px + nx * reflect_eps
        noy = py + ny * reflect_eps
        noz = pz + nz * reflect_eps
        cont = live & spec_pos
        if use_fresnel:
            cosr = jnp.maximum(-(ndx * nx + ndy * ny + ndz * nz), 0.0)
            x1 = 1.0 - cosr
            f = jnp.clip(x1 ** 5, 0.0, 0.8)
            w = kf * f
            natr = atr * (mcr + (1.0 - mcr) * w)
            natg = atg * (mcg + (1.0 - mcg) * w)
            natb = atb * (mcb + (1.0 - mcb) * w)
            # extra term NOT attenuated (reference double-count, comp:510)
            accr = accr + jnp.where(cont, (1.0 - w) * mcr * col_r, 0.0)
            accg = accg + jnp.where(cont, (1.0 - w) * mcg * col_g, 0.0)
            accb = accb + jnp.where(cont, (1.0 - w) * mcb * col_b, 0.0)
        else:
            natr = atr * ks
            natg = atg * ks
            natb = atb * ks
        atr = jnp.where(cont, natr, atr)
        atg = jnp.where(cont, natg, atg)
        atb = jnp.where(cont, natb, atb)
        ox = jnp.where(cont, nox, whitted.PARK_ORIGIN)
        oy = jnp.where(cont, noy, whitted.PARK_ORIGIN)
        oz = jnp.where(cont, noz, whitted.PARK_ORIGIN)
        dx = jnp.where(cont, ndx, whitted._PARK_DIR)
        dy = jnp.where(cont, ndy, whitted._PARK_DIR)
        dz = jnp.where(cont, ndz, whitted._PARK_DIR)
        alive = cont

    accr_ref[0] = accr
    accg_ref[0] = accg
    accb_ref[0] = accb
    if emit_state:
        for ref, v in zip(state_refs,
                          (ox, oy, oz, dx, dy, dz, atr, atg, atb)):
            ref[0] = v


def _wholeframe_render(split: SplitScene, attr_tab, light: Light,
                       o, d, bg, cfg: RenderConfig, camera=None,
                       grid_shape=None, bounces=None, emit_state=False,
                       consume_state=False, state=None, y_off=0.0):
    """Trace blocked rays o/d/bg (R, 3) to final colors (R, 3) in one
    pallas launch (see _wholeframe_kernel). With camera+grid_shape
    given (USE_KERNEL_RAYGEN), o/d/bg are None and rays are generated
    in-kernel.

    Hybrid sorted-continuation plumbing: emit_state returns
    (colors, [o(3), d(3), atten(3)] flat comps); consume_state takes
    ``state`` (10 flat (R,) comps: o, d, atten, ret-as-f32) plus
    grid_shape (for the in-kernel bg re-derivation from ret) instead
    of o/d/bg and returns colors."""
    interpret = _auto_interpret(cfg)
    th, tw = cfg.tile_h, cfg.tile_w
    tile = th * tw
    raygen = None
    consume_geom = None
    if consume_state:
        r = state[0].shape[0]
        assert r % tile == 0
        g = r // tile
        rays = jnp.stack(state).reshape(10, g, th, tw)
        _, n_bw, bh, bw = grid_shape
        consume_geom = (cfg.height, tile, bh, bw, n_bw)
        par = jnp.concatenate(
            [light.position, light.color,
             jnp.zeros(14, jnp.float32),
             jnp.reshape(jnp.asarray(y_off, jnp.float32), (1,)),
             jnp.zeros(3, jnp.float32)]).astype(jnp.float32) \
            .reshape(1, 24)
    elif camera is not None:
        n_bh, n_bw, bh, bw = grid_shape
        # the in-kernel pixel mapping derives (row, col) with f32
        # floor-div/mod, exact ONLY for power-of-two block/tile widths
        # (ADVICE r2: a non-power-of-two custom tile would silently
        # scramble pixel regions — refuse instead)
        assert bw & (bw - 1) == 0 and tw & (tw - 1) == 0, \
            f"kernel raygen needs power-of-two widths, got bw={bw} tw={tw}"
        g = n_bh * n_bw
        r = g * tile
        raygen = (cfg.width, cfg.height, bh, bw, th, tw, n_bw)
        half_h = jnp.tan(jnp.deg2rad(camera.fov_deg / 2.0))
        half_w = half_h * camera.aspect
        par = jnp.concatenate(
            [light.position, light.color, camera.position, camera.front,
             camera.right, camera.up,
             jnp.stack([half_w, half_h]).reshape(2),
             jnp.reshape(jnp.asarray(y_off, jnp.float32), (1,)),
             jnp.zeros(3, jnp.float32)]).astype(jnp.float32).reshape(1, 24)
    else:
        r = o.shape[0]
        pad = (-r) % tile
        comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 bg[:, 0], bg[:, 1], bg[:, 2]]
        if pad:
            fills = [2e30, 2e30, 2e30, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
            comps = [jnp.pad(c, ((0, pad),), constant_values=f)
                     for c, f in zip(comps, fills)]
        g = comps[0].shape[0] // tile
        rays = jnp.stack(comps).reshape(9, g, th, tw)
        par = jnp.concatenate(
            [light.position, light.color,
             jnp.zeros(18, jnp.float32)]).astype(jnp.float32) \
            .reshape(1, 24)

    rid_values = split.rid_values \
        if (USE_STATIC_RESOLVE
            and len(split.rid_values) <= STATIC_RESOLVE_MAX) else None
    kern = functools.partial(
        _wholeframe_kernel, m=split.m, n_other=split.n_other,
        n_sph=split.n_sph, use_mt=cfg.use_mt, use_gram=cfg.use_gram_tri,
        bounces=bounces if bounces is not None else cfg.max_bounces,
        shadow_eps=float(cfg.shadow_eps),
        reflect_eps=float(cfg.reflect_eps),
        use_fresnel=cfg.use_fresnel, enable_shadows=cfg.enable_shadows,
        unroll=TRI_UNROLL, rid_values=rid_values, raygen=raygen,
        emit_state=emit_state, consume_state=consume_state,
        consume_geom=consume_geom)
    if raygen is not None:
        def body(ls, lc, sk, nd, pr, tr, tb, pa, *outs):
            # rays_ref slot is None: rays are generated in-kernel
            kern(ls, lc, sk, nd, pr, tr, tb, pa, None, *outs)
        in_specs = [
            pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.pre_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.tri_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(attr_tab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (*split.device_args(), attr_tab, par)
    else:
        body = kern
        in_specs = [
            pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.pre_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.tri_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(attr_tab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10 if consume_state else 9, 1, th, tw),
                         lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (*split.device_args(), attr_tab, par, rays)
    n_out = 3 + (9 if emit_state else 0)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0))
                   for _ in range(n_out)],
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.float32)
                        for _ in range(8)],
    )
    outs = pl.pallas_call(
        body,
        grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((g, th, tw), jnp.float32)
                   for _ in range(n_out)],
        interpret=interpret,
    )(*operands)
    colors = jnp.stack([x.reshape(-1)[:r] for x in outs[:3]], axis=-1)
    if emit_state:
        return colors, [x.reshape(-1) for x in outs[3:]]
    return colors


def _split_kernel(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                  pre_ref, tri_ref, rays_ref, t_ref, gid_ref, **kw):
    _split_body(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                pre_ref, tri_ref, rays_ref, t_ref, gid_ref, **kw)


def _split_kernel_attrs(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                        pre_ref, tri_ref, rays_ref, t_ref, gid_ref,
                        *attr_refs, **kw):
    """Closest-hit variant that also emits shading attributes (normal +
    material) per lane, eliminating the XLA-side jnp.take gathers that
    dominate wave cost (~25ms/wave at 800x600 on v5e)."""
    _split_body(leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref,
                pre_ref, tri_ref, rays_ref, t_ref, gid_ref,
                attr_refs=attr_refs, **kw)


def _resolve_kernel(tab_ref, rays_ref, nx_ref, ny_ref, nz_ref,
                    cr_ref, cg_ref, cb_ref, ka_ref, kd_ref, ks_ref,
                    kf_ref, sh_ref):
    """Post-traversal shading-attribute resolve: replaces the XLA-side
    ``jnp.take(attr_tab, sid)`` gather (measured ~3.2ms/wave at 800x600 on
    v5e — half the frame across 3 waves) with an on-device loop over the
    DISTINCT winning shape ids of the tile. Rays within a tile hit few
    distinct shapes, so the loop runs ~5-30 iterations of one scalar row
    load + masked accumulate, instead of a 2048-lane hardware gather.

    Mosaic-safe by construction (see memory/mosaic-kernel-limits):
    dynamic-SUBLANE static-lane scalar loads from the row-major (N, 16)
    table; masks carried/blended as f32 arithmetic (no scalar-pred
    selects); attrs accumulated into OUTPUT REFS under disjoint masks
    (no wide vector carries — the round-1 attrs-in-traversal variant
    carried 13 vectors and wedged the remote compile).

    rays rows: [gid, px, py, pz] (gid: float shape id, -1 on miss —
    resolved as row 0 exactly like the XLA path's clamped take).
    tab columns (whitted._attr_table): n(3), color(3), ka, kd, ks, kf,
    shininess, center(3), is_sphere."""
    gid = jnp.maximum(rays_ref[0, 0], 0.0)
    px = rays_ref[1, 0]
    py = rays_ref[2, 0]
    pz = rays_ref[3, 0]

    outs = (nx_ref, ny_ref, nz_ref, cr_ref, cg_ref, cb_ref,
            ka_ref, kd_ref, ks_ref, kf_ref, sh_ref)
    for ref in outs:
        ref[0] = jnp.zeros_like(gid)

    def cond(state):
        return jnp.any(state > 0.0)

    def body(unres):
        s = jnp.min(jnp.where(unres > 0.0, gid, 3.4e38))
        si = s.astype(jnp.int32)
        mf = ((gid == s).astype(jnp.float32)) * unres
        # sphere normal from the hit point, plane-family from the table;
        # scalar-typed blend (no scalar-pred select)
        is_s = tab_ref[si, 14]
        rx = px - tab_ref[si, 11]
        ry = py - tab_ref[si, 12]
        rz = pz - tab_ref[si, 13]
        inv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz + 1e-30)
        nx = is_s * (rx * inv) + (1.0 - is_s) * tab_ref[si, 0]
        ny = is_s * (ry * inv) + (1.0 - is_s) * tab_ref[si, 1]
        nz = is_s * (rz * inv) + (1.0 - is_s) * tab_ref[si, 2]
        vals = (nx, ny, nz, tab_ref[si, 3], tab_ref[si, 4], tab_ref[si, 5],
                tab_ref[si, 6], tab_ref[si, 7], tab_ref[si, 8],
                tab_ref[si, 9], tab_ref[si, 10])
        for ref, v in zip(outs, vals):
            ref[0] = ref[0] + mf * v     # masks disjoint across iterations
        return unres - mf

    jax.lax.while_loop(cond, body, jnp.ones_like(gid))


def make_attr_resolver(cfg: RenderConfig):
    """resolve(attr_tab, gid, p) -> (n, color, ka, kd, ks, kf, shininess):
    the kernel-side replacement for whitted.trace's single-row gather.
    attr_tab: (N, 16) from whitted._attr_table; gid: (R,) float shape id
    (-1 on miss); p: (R, 3) hit points. R must already be tile-blocked (it is
    — the caller blocks rays once per frame)."""
    interpret = _auto_interpret(cfg)
    th, tw = cfg.tile_h, cfg.tile_w

    @jax.jit
    def resolve(attr_tab, gid, p):
        r = gid.shape[0]
        tile = th * tw
        pad = (-r) % tile
        comps = [gid, p[:, 0], p[:, 1], p[:, 2]]
        if pad:
            comps = [jnp.pad(c, ((0, pad),), constant_values=-1.0)
                     for c in comps]
        g = comps[0].shape[0] // tile
        rays = jnp.stack(comps).reshape(4, g, th, tw)
        out_specs = [pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0))
                     for _ in range(11)]
        out_shape = [jax.ShapeDtypeStruct((g, th, tw), jnp.float32)
                     for _ in range(11)]
        outs = pl.pallas_call(
            _resolve_kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(attr_tab.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 1, th, tw), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(attr_tab, rays)
        nx, ny, nz, cr, cg, cb, ka, kd, ks, kf, sh = \
            [x.reshape(-1)[:r] for x in outs]
        n = jnp.stack([nx, ny, nz], axis=-1)
        color = jnp.stack([cr, cg, cb], axis=-1)
        return n, color, ka, kd, ks, kf, sh

    return resolve


def make_closest_hit(split: SplitScene, cfg: RenderConfig):
    """closest_hit(o, d) -> (t, sid, hit) plus .occlusion(o, d, max_t)."""
    interpret = _auto_interpret(cfg)
    th, tw = cfg.tile_h, cfg.tile_w

    def run_comps(comps, occlusion, emit_attrs=False, fused=False):
        r = comps[0].shape[0]
        tile = th * tw
        pad = (-r) % tile
        if pad:
            fills = [2e30, 2e30, 2e30, 1.0, 1.0, 1.0] \
                + [0.0] * (len(comps) - 6)
            comps = [jnp.pad(c, ((0, pad),), constant_values=f)
                     for c, f in zip(comps, fills)]
        g = comps[0].shape[0] // tile
        nrow = len(comps)
        rays = jnp.stack(comps).reshape(nrow, g, th, tw)

        base_kw = dict(m=split.m, n_other=split.n_other,
                       n_sph=split.n_sph, use_mt=cfg.use_mt,
                       use_gram=cfg.use_gram_tri)
        kw = dict(base_kw, occlusion=occlusion, unroll=TRI_UNROLL)
        ray_spec = pl.BlockSpec((nrow, 1, th, tw),
                                lambda i, *_: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        n_out = 3 if fused else 2 + (N_ATTRS if emit_attrs else 0)
        out_specs = [pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0))
                     for _ in range(n_out)]
        out_shape = [jax.ShapeDtypeStruct((g, th, tw), jnp.float32)
                     for _ in range(n_out)]
        if fused:
            kern = functools.partial(_fused_kernel, **base_kw,
                                     shadow_eps=float(cfg.shadow_eps),
                                     unroll=TRI_UNROLL)
        elif emit_attrs:
            kern = functools.partial(_split_kernel_attrs, **kw)
        else:
            kern = functools.partial(_split_kernel, **kw)
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(split.pre_rows.shape,
                             lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(split.tri_rows.shape,
                             lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                ray_spec,
            ],
            out_specs=out_specs,
        )
        args = split.device_args()
        outs = pl.pallas_call(
            kern,
            grid_spec=spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args, rays)
        return [x.reshape(-1)[:r] for x in outs]

    def run(o, d, extra, occlusion, emit_attrs=False):
        comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
        if extra is not None:
            comps.append(extra)
        return run_comps(comps, occlusion, emit_attrs)

    @jax.jit
    def closest_hit(o, d):
        t, gid = run(o, d, None, occlusion=False)
        hit = t < INF
        sid = jnp.maximum(gid, 0.0).astype(jnp.int32)
        return t, sid, hit

    @jax.jit
    def fused_shadow(o, d, light_pos):
        """(t, sid, hit, in_shadow) in ONE kernel launch — see
        _fused_kernel. light_pos: (3,)."""
        r = o.shape[0]
        lr = jnp.broadcast_to(light_pos.reshape(3, 1), (3, r))
        comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 lr[0], lr[1], lr[2]]
        t, gid, sh = run_comps(comps, occlusion=False, fused=True)
        hit = t < INF
        sid = jnp.maximum(gid, 0.0).astype(jnp.int32)
        return t, sid, hit, sh > 0.5

    @jax.jit
    def closest_hit_attrs(o, d):
        outs = run(o, d, None, occlusion=False, emit_attrs=True)
        t, gid = outs[0], outs[1]
        a = outs[2:]
        hit = t < INF
        sid = jnp.maximum(gid, 0.0).astype(jnp.int32)
        attrs = {
            "normal": jnp.stack([a[0], a[1], a[2]], axis=-1),
            "color": jnp.stack([a[3], a[4], a[5]], axis=-1),
            "ambient": a[6], "diffuse": a[7], "specular": a[8],
            "fresnel": a[9], "shininess": a[10],
        }
        return t, sid, hit, attrs

    closest_hit_attrs.provides_attrs = True

    @jax.jit
    def occlusion(o, d, max_t):
        t, _ = run(o, d, max_t, occlusion=True)
        return t == 0.0

    closest_hit.occlusion = occlusion
    closest_hit_attrs.occlusion = occlusion
    closest_hit_attrs.base = closest_hit
    closest_hit.with_attrs = closest_hit_attrs
    closest_hit.fused_shadow = fused_shadow
    return closest_hit


def _render_blocks(scene: FlatScene, split: SplitScene, camera, light,
                   cfg: RenderConfig, grid_shape, y_off=0.0):
    """Wholeframe-kernel render of a WINDOW of (n_bh x n_bw) pixel blocks
    with in-kernel raygen — the production route, reusable per shard.
    ``y_off`` is the pixel-row offset of the window within the full
    cfg.height image (0 for a whole-frame launch; dev*strip_h under the
    strip-sharded mesh decomposition, parallel/sharding.py) and may be a
    traced scalar (jax.lax.axis_index-derived). Takes the sorted-
    continuation hybrid when cfg.sort_bounces allows (see _render_impl's
    route notes); returns un-blocked (n_bh*bh, n_bw*bw, 3) colors."""
    n_bh, n_bw, bh, bw = grid_shape
    attr_tab = whitted._attr_table(scene)
    # f32-exact window-local ray index bound for the hybrid's ret column
    hybrid = (cfg.sort_bounces and cfg.max_bounces >= 2
              and (n_bh * bh) * (n_bw * bw) < 2 ** 24)
    if hybrid:
        # HYBRID SORTED CONTINUATION: bounce 1 runs the wholeframe
        # kernel (in-kernel raygen/resolve/shading) and emits the
        # reflection rays + attenuation; an XLA payload sort re-packs
        # those divergent rays into coherent tiles (parked lanes
        # compacted into whole skippable tiles); a second wholeframe
        # launch finishes bounces 2..n on the sorted stream. Per-lane
        # HIT DECISIONS are bit-exact vs the unsorted frame (packet
        # composition never changes a lane's traversal result); colors
        # are equal up to f32 add reassociation — the two-launch split
        # plus the deferred background add re-associates the
        # accumulation (the parity test pins atol=1e-6, not equality).
        # Census basis: 83-88% of leaf tests come from the divergent
        # waves; sorting cuts their leaf visits 2.7x (scene 2,
        # benchmarks/sort_eval.py).
        acc1, state = _wholeframe_render(
            split, attr_tab, light, None, None, None,
            cfg, camera=camera, grid_shape=grid_shape,
            bounces=1, emit_state=True, y_off=y_off)
        o2 = jnp.stack(state[0:3], axis=-1)
        d2 = jnp.stack(state[3:6], axis=-1)
        ret0 = jnp.arange(state[0].shape[0], dtype=jnp.int32)
        key = whitted._bounce_sort_key(o2, d2, state[0] < 1e30)
        # bg does NOT ride the sort: the continuation kernel re-derives
        # it from ret (consume_geom), saving 3 of the 14 payload
        # columns (~1 ms/3-4 columns at 506K rows, NOTES_r4 model)
        s = jax.lax.sort(
            (key,) + tuple(state) + (ret0,),
            dimension=0, num_keys=1, is_stable=True)
        if cfg.second_sort and cfg.max_bounces >= 3:
            # 3-launch frame: bounce 2 alone (consume+emit), a SECOND
            # re-pack keyed on the bounce-3 rays (acc2 and ret ride as
            # payload), then bounces 3..n on the re-sorted stream. The
            # final un-sort folds acc2 in (both are in s2 order).
            acc2, st2 = _wholeframe_render(
                split, attr_tab, light, None, None,
                None, cfg, grid_shape=grid_shape,
                bounces=1, consume_state=True, emit_state=True,
                state=list(s[1:10]) + [s[10].astype(jnp.float32)],
                y_off=y_off)
            o3 = jnp.stack(st2[0:3], axis=-1)
            d3 = jnp.stack(st2[3:6], axis=-1)
            key2 = whitted._bounce_sort_key(o3, d3, st2[0] < 1e30)
            s2 = jax.lax.sort(
                (key2,) + tuple(st2)
                + (acc2[:, 0], acc2[:, 1], acc2[:, 2], s[10]),
                dimension=0, num_keys=1, is_stable=True)
            accc = _wholeframe_render(
                split, attr_tab, light, None, None,
                None, cfg, grid_shape=grid_shape,
                bounces=cfg.max_bounces - 2, consume_state=True,
                state=list(s2[1:10]) + [s2[13].astype(jnp.float32)],
                y_off=y_off)
            u = jax.lax.sort(
                (s2[13], accc[:, 0] + s2[10], accc[:, 1] + s2[11],
                 accc[:, 2] + s2[12]),
                dimension=0, num_keys=1, is_stable=True)
        else:
            accb_ = _wholeframe_render(
                split, attr_tab, light, None, None,
                None, cfg, grid_shape=grid_shape,
                bounces=cfg.max_bounces - 1, consume_state=True,
                state=list(s[1:10]) + [s[10].astype(jnp.float32)],
                y_off=y_off)
            u = jax.lax.sort(
                (s[10], accb_[:, 0], accb_[:, 1], accb_[:, 2]),
                dimension=0, num_keys=1, is_stable=True)
        colors = acc1 + jnp.stack([u[1], u[2], u[3]], axis=-1)
    else:
        # rays + background generated in-kernel from the pixel iota,
        # skipping the XLA raygen pipeline (camera_rays + 3 to_blocks
        # relayouts + bg broadcast) entirely.
        colors = _wholeframe_render(
            split, attr_tab, light, None, None, None,
            cfg, camera=camera, grid_shape=grid_shape, y_off=y_off)
    colors = colors.reshape(n_bh, n_bw, bh, bw, 3)
    return colors.transpose(0, 2, 1, 3, 4).reshape(n_bh * bh,
                                                   n_bw * bw, 3)


@functools.partial(jax.jit, static_argnames=("cfg", "differentiable"))
def _render_impl(scene: FlatScene, split: SplitScene, camera, light,
                 cfg: RenderConfig, differentiable: bool = False):
    h, w = cfg.height, cfg.width
    closest = make_closest_hit(split, cfg)
    if differentiable:
        from raytracer_tpu.diff.kernel_vjp import make_differentiable_closest
        occl = closest.occlusion
        closest = make_differentiable_closest(scene, closest, cfg.use_mt)
        closest.occlusion = occl
    elif USE_KERNEL_ATTRS:
        # kernel-emitted shading attributes skip the XLA gathers entirely;
        # default off — the 13-vector-carry kernel wedges the current
        # remote Mosaic toolchain's compile (whitted's packed single-gather
        # table covers most of the win meanwhile)
        closest = closest.with_attrs

    tile = cfg.tile_h * cfg.tile_w
    bh, bw = _block_shape(tile)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw

    def to_blocks(x, fill=0.0):
        x = jnp.pad(x, ((0, hp - h), (0, wp - w), (0, 0)),
                    constant_values=fill)
        x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    use_wholeframe = USE_WHOLEFRAME and not differentiable \
        and not USE_KERNEL_ATTRS and not USE_OCCLUSION
    # the in-kernel pixel mapping is exact only for power-of-two block/
    # tile widths (ADVICE r2): fall back to fed rays otherwise
    raygen_ok = USE_KERNEL_RAYGEN and bw & (bw - 1) == 0 \
        and cfg.tile_w & (cfg.tile_w - 1) == 0
    # The hybrid carries the original blocked pixel index as f32 through
    # the payload sort (exact only below 2^24 pixels); beyond that, fall
    # through to the per-bounce whitted.trace sort path, which carries
    # int32 indices (ADVICE r4: a >16.7M-pixel render would otherwise
    # silently composite wrong backgrounds for post-sort misses).
    hybrid_ret_exact = hp * wp < 2 ** 24
    if use_wholeframe and cfg.sort_bounces and raygen_ok \
            and cfg.max_bounces >= 2 and hybrid_ret_exact:
        # sorted-continuation hybrid (route notes in _render_blocks)
        colors = _render_blocks(scene, split, camera, light, cfg,
                                (hp // bh, wp // bw, bh, bw))
        return colors[:h, :w]
    use_wholeframe = use_wholeframe and not cfg.sort_bounces
    if use_wholeframe and raygen_ok:
        colors = _render_blocks(scene, split, camera, light, cfg,
                                (hp // bh, wp // bw, bh, bw))
        return colors[:h, :w]

    # Block-order ray GENERATION in XLA (emit rays directly in tile lane
    # order, skipping these transposes) was A/B'd on chip: exactly
    # neutral (61.6 vs 61.4 FPS) — the cost is the XLA elementwise work
    # itself, which the in-kernel raygen path above removes.
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))
    o_b = to_blocks(o, fill=whitted.PARK_ORIGIN)
    d_b = to_blocks(d, fill=whitted._PARK_DIR)
    bg_b = to_blocks(bg)

    if use_wholeframe:
        colors = _wholeframe_render(split, whitted._attr_table(scene),
                                    light, o_b, d_b, bg_b, cfg)
    else:
        occl = closest.occlusion if USE_OCCLUSION else None
        fused = getattr(closest, "fused_shadow", None) \
            if USE_FUSED_SHADOW and cfg.enable_shadows else None
        resolve = make_attr_resolver(cfg) \
            if USE_RESOLVE_KERNEL and not differentiable \
            and not getattr(closest, "provides_attrs", False) else None
        colors = whitted.trace(scene, light, closest, o_b, d_b, bg_b, cfg,
                               occlusion_fn=occl, fused_fn=fused,
                               resolve_fn=resolve)
    colors = colors.reshape(hp // bh, wp // bw, bh, bw, 3)
    colors = colors.transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)
    return colors[:h, :w]


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
SAH_LEAF_TARGET = 96


def prepare(scene: FlatScene, ref_bvh: LinearBVH,
            tri_max_depth: int | None = None,
            tri_builder: str | None = None) -> SplitScene:
    return SplitScene(scene, ref_bvh, tri_max_depth, tri_builder)


def render(scene: FlatScene, bvh, camera: Camera, light: Light,
           cfg: RenderConfig, split: SplitScene = None,
           tri_max_depth: int | None = None,
           differentiable: bool = False) -> jnp.ndarray:
    """Render (H, W, 3) with the split-phase megakernel. ``bvh`` is the
    reference LinearBVH (for exact leaf-box gates on non-triangles); pass a
    prebuilt ``split`` to skip host prep. With ``differentiable`` the image
    carries gradients w.r.t. scene/camera/light (diff/kernel_vjp.py);
    note the SplitScene tables are rebuilt from the CURRENT scene by the
    caller when geometry changes."""
    if split is None:
        split = SplitScene(scene, bvh, tri_max_depth)
    return _render_impl(scene, split, camera, light, cfg, differentiable)
