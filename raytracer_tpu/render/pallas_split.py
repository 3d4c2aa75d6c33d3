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

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import shading, whitted
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.render.pallas_kernel import _auto_interpret
# Scene preparation (SplitScene row tables, canonical material grouping,
# per-frame device refreshers) lives in render/split_scene.py; the row
# layout constants are the packer<->kernel contract. Re-exported here so
# callers keep the historical `pallas_split.prepare(...)` etc. API.
from raytracer_tpu.render.split_scene import (  # noqa: F401
    G_GID, G_B0X, G_B0Y, G_B0Z, G_B1X, G_B1Y, G_B1Z,
    G_MCR, G_MCG, G_MCB, G_MKA, G_MKD, G_MKS, G_MKF, G_MSH, G_RID, PRE_W,
    T_NX, T_NY, T_NZ, T_PD, T_E1X, T_E1Y, T_E1Z, T_E2X, T_E2Y, T_E2Z,
    T_P1X, T_P1Y, T_P1Z, T_S0, T_S1, T_R11, T_R01, T_R00, T_GID,
    T_MCR, T_MCG, T_MCB, T_MKA, T_MKD, T_MKS, T_MKF, T_MSH, T_RID,
    T_EVX, T_EVY, T_EVZ, T_CV, T_EWX, T_EWY, T_EWZ, T_CW, TRI_W,
    SplitScene, TRI_LEAF_TARGET, _auto_tri_depth, _canonical_material_ids,
    prepare, update_pre_rows, update_tri_rows, update_dynamic,
    update_materials)
from raytracer_tpu.render import split_scene as _split_scene_mod
from raytracer_tpu.render import wholeframe  # noqa: E402 (cycle-safe: wholeframe imports pallas_split lazily)


def __getattr__(name):
    # Mutable knobs owned by sibling modules; forward attribute READS so
    # historical `pallas_split.X` probes keep seeing the live value
    # (writes must target the owning module directly).
    if name in ("TRI_BUILDER", "SAH_LEAF_TARGET"):
        return getattr(_split_scene_mod, name)
    if name in ("USE_WHOLEFRAME", "USE_STATIC_RESOLVE",
                "STATIC_RESOLVE_MAX", "USE_KERNEL_RAYGEN", "CONT_TILE",
                "USE_GATHER_REPACK", "SLIM_SORT", "_render_blocks",
                "_wholeframe_render", "_wholeframe_kernel"):
        from raytracer_tpu.render import wholeframe as _wf
        return getattr(_wf, name)
    raise AttributeError(name)

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

# Measured dead ends (component-SoA pipeline, cond-split state machine,
# SMEM-tables kernel, full-Whitted 12-vector megakernel, any-hit
# occlusion shadows, bundle-gated sphere pre-pass, static brute walks,
# grouped/octant-ordered/multi-state/bitmask walks, software-pipelined
# walk merging, MXU triangle tests, argsort+gather re-ordering):
# docs/KERNEL_NOTES.md. Do not retry without new information.

# Triangle tests per traversal iteration. The while loop is ITERATION-
# latency bound (A/B: halving per-iteration vector work via USE_COND_STEP
# changed nothing), so testing U triangles per iteration against a
# shallower tree (bigger leaves, see TRI_LEAF_TARGET) cuts iteration
# count near-linearly while the extra vector lanes ride for free.
# v5e sweep (scene 1, 800x600x3): U=16 with ~75-triangle leaves gave
# 47.2 FPS vs 32.4 at U=1/depth-20. Re-swept round 2 under the leaf-cond
# walk (internal iterations skip the U tests entirely, so a bigger U no
# longer taxes them): U=32 on the m=49 tree gives 103 FPS vs 98.8 at
# U=16; U=24 (85.5 — sublane-misaligned), leaf 64 (98.6), tiles 8x128
# (83.2) / 32x128 (99.4) all lose. RE-SWEPT round 5 under the final
# wholeframe + slim-sort kernel (same-view, bit-exact, quiet chip):
# U48/leaf128 beats U32/leaf96 on BOTH scenes (scene 2 hybrid
# 70.9 -> 72.9, scene 1 140.5 -> 141.3); U64 and leaf 192 lose.
TRI_UNROLL = 48

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

# Walk steps per while-loop iteration in _closest_pass (1 or 2). The
# census says ~2.6 ms of the scene-1 frame is per-iteration control
# latency (~0.29us x ~9k iterations); 2 steps per iteration halves the
# while-loop backedge share of it (the second step is OOB-guarded and
# no-ops past the end). Bit-exact: the same step sequence executes.
WALK_STEPS = 1

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
                  rid=False, t_init=None):
    pre_ref = _maybe_const(pre_ref)
    """One full closest-hit traversal (pre-pass + triangle packet walk) as
    a pure function of ray components, callable multiple times per kernel
    body. Mirrors _split_body's closest branch exactly (including the
    TRI_UNROLL batched triangle tests); with_normals additionally carries
    the hit normal (3 extra vector carries) so the caller can derive
    secondary rays in-register. rid=True carries the canonical resolve id
    (T_RID/G_RID) instead of the true gid — exact for material resolve
    only (see the T_RID note), used by the wholeframe kernel.

    t_init: optional per-lane initial t_best (default INF). A SHADOW walk
    passes the light distance: every comparison in the walk is strict
    (t < t_best; probes tmin <= t_best), so hits at or beyond the light
    never influence ``in_shadow = t < limit`` — but subtrees entirely
    beyond the light now fail the probe and are skipped. Bit-exact for
    the shadow decision; the returned t is min(closest hit < limit,
    limit) and the returned gid/normals are only meaningful for hits
    under the limit."""
    tcol = T_RID if rid else T_GID
    pcol = G_RID if rid else G_GID
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32) if t_init is None else t_init
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

    def make_body(guarded):
        """One walk step. guarded=True makes it a NO-OP when ptr >= m
        (OOB-safe clamped reads + state passthrough) so WALK_STEPS=2 can
        run two steps per while iteration: the first is covered by the
        loop condition, the second may start past the end."""

        def body(state):
            ptr, k, t_best, gid_best = (state[0], state[1], state[2],
                                        state[3])
            nrm = state[4:]
            ok = (ptr < m) if guarded else None
            pr = jnp.minimum(ptr, m - 1) if guarded else ptr
            entering = k == 0

            def probe_node(_):
                b0x = nodes_ref[pr, 0]
                b0y = nodes_ref[pr, 1]
                b0z = nodes_ref[pr, 2]
                b1x = nodes_ref[pr, 3]
                b1y = nodes_ref[pr, 4]
                b1z = nodes_ref[pr, 5]
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
                # mid-leaf iterations (k > 0) never consume the slab
                # test: start_leaf and go_deeper are gated on `entering`
                pred = (entering & ok) if guarded else entering
                any_hit = jax.lax.cond(pred, probe_node,
                                       lambda _: jnp.bool_(False), 0)
            else:
                any_hit = probe_node(0)
                if guarded:
                    any_hit = any_hit & ok

            st = leaf_start_ref[pr]
            cnt = leaf_count_ref[pr]
            sk = skip_ref[pr]
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
            if guarded:
                new_ptr = jnp.where(ok, new_ptr, ptr)
                new_k = jnp.where(ok, new_k, k)
            return (new_ptr, new_k, t_best, gid_best) + nrm

        return body

    body = make_body(False)
    if WALK_STEPS == 2:
        body_b = make_body(True)
        step_fn = lambda s: body_b(body(s))
    else:
        step_fn = body

    def run_all(carry):
        # pre-pass + packet walk under ONE liveness cond: an all-parked
        # tile (bounce waves 2/3, all-miss shadow passes) does zero
        # vector work — see _split_body.run_all
        if n_other and RUN_PREPASS:
            carry = run_prepass(carry)
        if not RUN_TRAVERSAL:
            return carry
        out = jax.lax.while_loop(cond, step_fn,
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

    # t_init=limit: beyond-light subtrees fail the probe's strict
    # tmin <= t_best test and are skipped — bit-exact for in_shadow
    # (see _closest_pass docstring)
    st, _ = _closest_pass(
        leaf_start_ref, leaf_count_ref, skip_ref, nodes_ref, pre_ref,
        tri_ref, sox, soy, soz, sdx, sdy, sdz,
        m=m, n_other=n_other, n_sph=n_sph, use_mt=use_mt, use_gram=use_gram,
        with_normals=False, unroll=unroll, t_init=limit)

    t_ref[0] = t
    gid_ref[0] = gid
    sh_ref[0] = (st < limit).astype(jnp.float32)


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

    use_wholeframe = wholeframe.USE_WHOLEFRAME and not differentiable \
        and not USE_KERNEL_ATTRS and not USE_OCCLUSION
    # the in-kernel pixel mapping is exact only for power-of-two block/
    # tile widths (ADVICE r2): fall back to fed rays otherwise
    raygen_ok = wholeframe.USE_KERNEL_RAYGEN and bw & (bw - 1) == 0 \
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
        colors = wholeframe._render_blocks(scene, split, camera, light,
                                           cfg, (hp // bh, wp // bw,
                                                 bh, bw))
        return colors[:h, :w]
    use_wholeframe = use_wholeframe and not cfg.sort_bounces
    if use_wholeframe and raygen_ok:
        colors = wholeframe._render_blocks(scene, split, camera, light,
                                           cfg, (hp // bh, wp // bw,
                                                 bh, bw))
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
