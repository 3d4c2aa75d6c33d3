"""Binned surface-area-heuristic (SAH) BVH builder.

A quality upgrade over the reference's median-of-center split
(src/main.cpp:1111-1173): at each node, 16 centroid bins per axis are
swept for the split minimizing the SAH cost

    C(L, R) = SA(L)·N_L + SA(R)·N_R

with a leaf emitted when no split beats the leaf cost N·SA(P) (scaled by
a traversal/intersection cost ratio) or when N <= leaf_target. Any
triangle tree is EXACT for the split kernel (contained shapes — see
render/pallas_split.py's module docstring), so the tree shape is a pure
performance choice; this builder exists for op-count reduction on
mesh-heavy scenes and as a production-quality alternative to the
reference-parity median builder (accel/bvh.py).

Emits the same root-last `BVH` container, so `linearize()` and every
downstream consumer work unchanged.
"""

from __future__ import annotations

import numpy as np

from raytracer_tpu.accel.bvh import BVH
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers

N_BINS = 16
# SAH constants: cost of one traversal step relative to one primitive
# intersection. The split kernel's measured economics (v5e): a walk
# iteration costs ~0.29us of control latency while U=32 tests ride in
# one iteration — so traversal steps are comparatively EXPENSIVE and a
# high C_TRAV biases toward bigger leaves, matching the measured
# TRI_LEAF_TARGET=128 optimum.
C_TRAV = 24.0
C_ISECT = 1.0
# v5e sweep at 800x600x3 (leaf_target, C_TRAV) -> FPS:
#   scene 2: (96,24) 50.1 | (128,24) 51.1 | (96,48) 51.2 | (64,48) 50.9
#   scene 1: (96,24) 124.0 | (128,24) 123.7 | (96,48) 122.2
# (96, 24) kept: within noise of the best on both scenes.


def build_sah(scene=None, leaf_target: int = 64, *, aabbs=None,
              centers=None, max_depth: int = 32,
              spatial: bool = False, max_refs_factor: float = 2.0) -> BVH:
    """Build a binned-SAH BVH over the scene's shapes (or explicit
    aabbs/centers). Returns the root-last BVH container.

    spatial=True additionally considers a mid-plane SPATIAL split at
    each node (SBVH-lite): references straddling the plane go to BOTH
    children with their boxes clamped to each side. Exactness is kept —
    the clamped boxes partition the primitive's AABB, so any hit point
    lies inside some copy's leaf box and the closest-hit min is
    idempotent to duplicate tests. Duplication is capped at
    max_refs_factor * N references. Consumers must treat `indices` as a
    multiset (the split kernel and refit machinery already do)."""
    if aabbs is None:
        mins, maxs = shape_aabbs(scene)
    else:
        mins, maxs = aabbs
    if centers is None:
        centers = shape_centers(scene)
    mins = np.asarray(mins, np.float32)
    maxs = np.asarray(maxs, np.float32)
    centers = np.asarray(centers, np.float32)
    n = mins.shape[0]
    ref_budget = [int(max(0.0, max_refs_factor - 1.0) * n)]

    # reference arrays (grow under spatial splits; ref -> original id)
    rid = np.arange(n, dtype=np.int64)
    rmin = mins.copy()
    rmax = maxs.copy()
    rcen = centers.copy()

    nodes_bmin: list = []
    nodes_bmax: list = []
    nodes_left: list = []
    nodes_right: list = []
    nodes_start: list = []
    nodes_count: list = []
    node_shapes: list = []
    indices: list = []

    def surf(bmin, bmax):
        d = np.maximum(bmax - bmin, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def emit_leaf(idx, bmin, bmax):
        nodes_bmin.append(bmin)
        nodes_bmax.append(bmax)
        nodes_left.append(-1)
        nodes_right.append(-1)
        nodes_start.append(len(indices))
        nodes_count.append(len(idx))
        node_shapes.append(rid[idx].astype(np.int32))
        indices.extend(int(i) for i in rid[idx])
        return len(nodes_bmin) - 1

    def object_split(idx, nn):
        """Best binned object split: (cost, lmask) or None."""
        best = None
        cb_min = rcen[idx].min(0)
        cb_max = rcen[idx].max(0)
        for axis in range(3):
            span = cb_max[axis] - cb_min[axis]
            if span <= 0:
                continue
            rel = (rcen[idx, axis] - cb_min[axis]) / span
            b = np.minimum((rel * N_BINS).astype(np.int32), N_BINS - 1)
            cnt = np.zeros(N_BINS, np.int64)
            bmn = np.full((N_BINS, 3), np.inf, np.float32)
            bmx = np.full((N_BINS, 3), -np.inf, np.float32)
            for k in range(N_BINS):
                m = b == k
                cnt[k] = m.sum()
                if cnt[k]:
                    bmn[k] = rmin[idx][m].min(0)
                    bmx[k] = rmax[idx][m].max(0)
            lcnt = np.cumsum(cnt)[:-1]
            rcnt = nn - lcnt
            la = np.empty(N_BINS - 1, np.float32)
            ra = np.empty(N_BINS - 1, np.float32)
            cmn = bmn[0].copy()
            cmx = bmx[0].copy()
            for k in range(N_BINS - 1):
                if k:
                    cmn = np.minimum(cmn, bmn[k])
                    cmx = np.maximum(cmx, bmx[k])
                la[k] = surf(cmn, cmx) if lcnt[k] else 0.0
            cmn = bmn[-1].copy()
            cmx = bmx[-1].copy()
            for k in range(N_BINS - 2, -1, -1):
                if k < N_BINS - 2:
                    cmn = np.minimum(cmn, bmn[k + 1])
                    cmx = np.maximum(cmx, bmx[k + 1])
                ra[k] = surf(cmn, cmx) if rcnt[k] else 0.0
            cost = la * lcnt + ra * rcnt
            valid = (lcnt > 0) & (rcnt > 0)
            if not valid.any():
                continue
            cost = np.where(valid, cost, np.inf)
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                best = (float(cost[k]), b <= k)
        return best

    def spatial_split(idx, nn, bmin, bmax):
        """Mid-plane spatial split on the largest axis with reference
        duplication: (cost, lsel, rsel, lclamp, rclamp, n_dup) or None.
        lsel/rsel index into idx; straddlers appear in both with their
        box clamped to the respective side."""
        axis = int(np.argmax(bmax - bmin))
        plane = 0.5 * (bmin[axis] + bmax[axis])
        lm = rmin[idx, axis] < plane
        rm = rmax[idx, axis] > plane
        lm |= ~rm   # degenerate boxes exactly on the plane -> left
        n_dup = int((lm & rm).sum())
        nl, nr = int(lm.sum()), int(rm.sum())
        if nl == 0 or nr == 0 or nl == nn or nr == nn:
            return None
        if n_dup > ref_budget[0]:
            return None
        lmin = rmin[idx][lm].min(0)
        lmax = rmax[idx][lm].max(0)
        lmax = lmax.copy()
        lmax[axis] = min(lmax[axis], plane)
        rmn = rmin[idx][rm].min(0).copy()
        rmn[axis] = max(rmn[axis], plane)
        rmx = rmax[idx][rm].max(0)
        cost = surf(lmin, lmax) * nl + surf(rmn, rmx) * nr
        return (float(cost), lm, rm, (axis, plane), n_dup)

    def build(idx, depth) -> int:
        bmin = rmin[idx].min(0)
        bmax = rmax[idx].max(0)
        nn = len(idx)
        if nn <= leaf_target or depth >= max_depth:
            return emit_leaf(idx, bmin, bmax)

        obj = object_split(idx, nn)
        spa = spatial_split(idx, nn, bmin, bmax) if spatial else None
        sa_p = surf(bmin, bmax)
        leaf_cost = C_ISECT * nn * sa_p
        obj_cost = obj[0] if obj is not None else np.inf
        spa_cost = spa[0] if spa is not None else np.inf
        split_cost = min(obj_cost, spa_cost)
        if (obj is None and spa is None) or \
                C_TRAV * sa_p + C_ISECT * split_cost >= leaf_cost:
            return emit_leaf(idx, bmin, bmax)

        if spa is not None and spa_cost < obj_cost:
            _, lm, rm, (axis, plane), n_dup = spa
            ref_budget[0] -= n_dup
            # left side: clamp straddlers' max to the plane
            lidx = idx[lm]
            straddle_l = lm & rm
            # duplicate straddlers for the right side with clamped min
            dup_src = idx[straddle_l]
            new_ids = np.arange(len(dup_src)) + rid.shape[0]
            _grow_refs(dup_src, axis, plane)
            # clamp the LEFT copies' max in place
            rmax[idx[straddle_l], axis] = np.minimum(
                rmax[idx[straddle_l], axis], plane)
            rcen[idx[straddle_l]] = 0.5 * (rmin[idx[straddle_l]]
                                           + rmax[idx[straddle_l]])
            ridx = np.concatenate([idx[rm & ~lm], new_ids])
            li = build(lidx, depth + 1)
            ri = build(ridx, depth + 1)
        else:
            _, lmask = obj
            li = build(idx[lmask], depth + 1)
            ri = build(idx[~lmask], depth + 1)
        nodes_bmin.append(bmin)
        nodes_bmax.append(bmax)
        nodes_left.append(li)
        nodes_right.append(ri)
        nodes_start.append(0)
        nodes_count.append(len(idx))
        node_shapes.append(rid[idx].astype(np.int32))
        return len(nodes_bmin) - 1

    def _grow_refs(src, axis, plane):
        """Append right-side clamped copies of refs `src`."""
        nonlocal rid, rmin, rmax, rcen
        nmin = rmin[src].copy()
        nmin[:, axis] = np.maximum(nmin[:, axis], plane)
        nmax = rmax[src].copy()
        rid = np.concatenate([rid, rid[src]])
        rmin = np.concatenate([rmin, nmin])
        rmax = np.concatenate([rmax, nmax])
        rcen = np.concatenate([rcen, 0.5 * (nmin + nmax)])

    build(np.arange(n, dtype=np.int64), 0)
    return BVH(
        bounds_min=np.asarray(nodes_bmin, np.float32),
        bounds_max=np.asarray(nodes_bmax, np.float32),
        left=np.asarray(nodes_left, np.int32),
        right=np.asarray(nodes_right, np.int32),
        start=np.asarray(nodes_start, np.int32),
        count=np.asarray(
            [c if l == -1 else 0
             for c, l in zip(nodes_count, nodes_left)], np.int32),
        indices=np.asarray(indices, np.int32),
        node_shapes=node_shapes,
    )
