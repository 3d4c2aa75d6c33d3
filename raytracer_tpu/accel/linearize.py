"""Stackless linearization of the BVH for vectorized (SIMT-style) traversal.

The reference walks the tree with a per-thread 64-entry stack
(gpu_shader.comp:384-427). Divergent per-lane stacks are a poor fit for a
vector machine, so we precompute a DFS ordering with SKIP POINTERS: nodes
laid out in depth-first order; at runtime each lane keeps a single node
pointer, advancing to ptr+1 when the AABB is hit and jumping to skip[ptr]
otherwise. Visiting every node whose AABB the ray hits is exactly the
reference's traversal semantics (it does no near-child ordering or t-based
culling either — SURVEY.md §5 item 8), so the same set of leaves is tested.

Shape indices are re-emitted in DFS-leaf order so every leaf owns a
contiguous range of the permuted shape table (the reference's
bvhIndices/startShapeIdx scheme, main.cpp:967-976, in a traversal-friendly
order).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel.bvh import BVH


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LinearBVH:
    """Device arrays for skip-pointer traversal. M nodes in DFS order."""

    bounds: jnp.ndarray      # (M, 6) f32: bmin xyz, bmax xyz
    leaf_start: jnp.ndarray  # (M,) i32: offset into perm (leaves), else 0
    leaf_count: jnp.ndarray  # (M,) i32: #shapes in leaf, 0 for internal
    skip: jnp.ndarray        # (M,) i32: next node after this subtree (M = end)
    perm: jnp.ndarray        # (K,) i32: shape ids in DFS-leaf order

    @property
    def num_nodes(self) -> int:
        return self.bounds.shape[0]

    def tree_flatten(self):
        return ((self.bounds, self.leaf_start, self.leaf_count, self.skip,
                 self.perm), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def linearize(bvh: BVH) -> LinearBVH:
    """Flatten a root-last BVH into DFS order with skip pointers."""
    m = bvh.num_nodes
    order: list = []     # node id in DFS order
    bounds = np.zeros((m, 6), np.float32)
    leaf_start = np.zeros(m, np.int32)
    leaf_count = np.zeros(m, np.int32)
    skip = np.zeros(m, np.int32)
    perm: list = []

    def visit(node: int) -> int:
        """Emit subtree of ``node``; returns DFS index just past it."""
        me = len(order)
        order.append(node)
        bounds[me, 0:3] = bvh.bounds_min[node]
        bounds[me, 3:6] = bvh.bounds_max[node]
        if bvh.left[node] == -1:
            leaf_start[me] = len(perm)
            cnt = int(bvh.count[node])
            leaf_count[me] = cnt
            s = int(bvh.start[node])
            perm.extend(bvh.indices[s:s + cnt].tolist())
        else:
            visit(int(bvh.left[node]))
            visit(int(bvh.right[node]))
        skip[me] = len(order)
        return skip[me]

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10 * m + 100))
    try:
        visit(bvh.root)
    finally:
        sys.setrecursionlimit(old)
    assert len(order) == m, (len(order), m)

    return LinearBVH(
        bounds=jnp.asarray(bounds),
        leaf_start=jnp.asarray(leaf_start),
        leaf_count=jnp.asarray(leaf_count),
        skip=jnp.asarray(skip),
        perm=jnp.asarray(np.asarray(perm, np.int32)),
    )


def shape_leaf_boxes(lin: LinearBVH, num_shapes: int):
    """Per-shape leaf AABB, ((N,3) min, (N,3) max) — the box that gates a
    shape's visibility under BVH traversal (see
    geom.batched.intersect_scene's leaf_boxes)."""
    bounds = np.asarray(lin.bounds)
    starts = np.asarray(lin.leaf_start)
    counts = np.asarray(lin.leaf_count)
    perm = np.asarray(lin.perm)
    bmin = np.zeros((num_shapes, 3), np.float32)
    bmax = np.zeros((num_shapes, 3), np.float32)
    for node in np.nonzero(counts > 0)[0]:
        sl = perm[starts[node]:starts[node] + counts[node]]
        bmin[sl] = bounds[node, 0:3]
        bmax[sl] = bounds[node, 3:6]
    return jnp.asarray(bmin), jnp.asarray(bmax)
