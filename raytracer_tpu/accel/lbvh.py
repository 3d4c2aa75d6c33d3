"""On-device LBVH: linear BVH built entirely with jnp ops (jit-able), for
per-frame rebuild of animated scenes.

The reference's answer to animation is updateBVH's grow-only refit
(src/main.cpp:1068-1077), which degrades traversal quality monotonically.
The TPU-native answer is to REBUILD every frame on device:

  1. 30-bit Morton codes of shape centers (grid-quantized into the scene
     AABB), index-salted to make keys unique;
  2. one `jax.lax.sort` (the TPU-friendly primitive);
  3. Karras 2012 parallel radix-tree construction — every internal node's
     leaf range and split from closed-form common-prefix queries, no
     sequential dependency;
  4. DFS/skip-pointer linearization WITHOUT a tree walk: for a radix tree,
     preorder is exactly the sort by (range start asc, range size desc),
     and each node's skip pointer is searchsorted(starts, end+1) — both
     single vectorized ops;
  5. node AABBs as range-min/max queries over the sorted leaf boxes via a
     log2(n) sparse table (pure vector min/max, no scatter).

Output is the same LinearBVH ABI the wavefront renderer and Pallas kernels
consume (accel/linearize.py). Note the leaf boxes differ from the host
median-split tree, so images match the reference's useBVH=true output only
for box-contained shapes (everything except degenerate infinite walls —
see render/pallas_split.py for why that's the only caveat).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raytracer_tpu.accel.linearize import LinearBVH


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zeros between each
    (standard Morton bit-interleave helper). Constants wrapped as uint32 —
    bare Python ints above 2^31 overflow the default int32 weak type."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(centers: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray
                 ) -> jnp.ndarray:
    """30-bit Morton code per center, quantized into [lo, hi]."""
    extent = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((centers - lo) / extent, 0.0, 0.999999)
    xyz = (q * 1024.0).astype(jnp.uint32)
    return (_expand_bits(xyz[:, 0]) * 4 + _expand_bits(xyz[:, 1]) * 2
            + _expand_bits(xyz[:, 2])).astype(jnp.uint32)


@partial(jax.jit, static_argnames=())
def build_lbvh(aabb_min: jnp.ndarray, aabb_max: jnp.ndarray,
               centers: jnp.ndarray) -> LinearBVH:
    """Build a LinearBVH over N shapes; all inputs (N,3) f32. Fully traced:
    safe to call every animation frame under jit."""
    n = centers.shape[0]
    if n == 1:
        bounds = jnp.concatenate([aabb_min, aabb_max], axis=1)
        return LinearBVH(bounds=bounds,
                         leaf_start=jnp.zeros(1, jnp.int32),
                         leaf_count=jnp.ones(1, jnp.int32),
                         skip=jnp.ones(1, jnp.int32),
                         perm=jnp.zeros(1, jnp.int32))

    lo = jnp.min(aabb_min, axis=0)
    hi = jnp.max(aabb_max, axis=0)
    codes = morton_codes(centers, lo, hi)

    # sort (code, original index); TPU has no 64-bit keys, so ties are
    # broken by the sorted POSITION inside delta (Karras's standard trick)
    codes_s, perm = jax.lax.sort((codes, jnp.arange(n, dtype=jnp.int32)),
                                 num_keys=1)

    lmin = jnp.take(aabb_min, perm, axis=0)
    lmax = jnp.take(aabb_max, perm, axis=0)

    def _clz32(x):
        # count leading zeros via bit smear + popcount (no f64 on TPU)
        x = x | (x >> 1)
        x = x | (x >> 2)
        x = x | (x >> 4)
        x = x | (x >> 8)
        x = x | (x >> 16)
        return (32 - jax.lax.population_count(x)).astype(jnp.int32)

    # common-prefix length between sorted keys i and j (out of range -> -1);
    # equal codes extend the prefix with the positions' common prefix
    def delta(i, j):
        ok = (j >= 0) & (j < n)
        jj = jnp.clip(j, 0, n - 1)
        x = codes_s[i] ^ codes_s[jj]
        ix = (i.astype(jnp.uint32) ^ jj.astype(jnp.uint32))
        base = jnp.where(x == 0, 32 + _clz32(ix), _clz32(x))
        return jnp.where(ok, base, -1)

    i = jnp.arange(n - 1, dtype=jnp.int32)
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # find range length by doubling then binary search (fixed 32+32 steps)
    lmax_len = jnp.full_like(i, 2)

    def dbl_body(_, lm):
        probe = i + lm * d
        more = delta(i, probe) > delta_min
        return jnp.where(more, lm * 2, lm)

    lmax_len = jax.lax.fori_loop(0, 32, dbl_body, lmax_len)

    ln = jnp.zeros_like(i)
    t = lmax_len // 2

    def bin_body(_, carry):
        ln, t = carry
        probe = i + (ln + t) * d
        ok = delta(i, probe) > delta_min
        ln = jnp.where(ok, ln + t, ln)
        return ln, jnp.maximum(t // 2, 1)

    # enough iterations to reduce t from n/2 to 1
    ln, _ = jax.lax.fori_loop(0, 34, bin_body, (ln, t))
    j = i + ln * d
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    # split position: largest s in [first, last-1] with
    # delta(first, s+1) > delta(first, last)
    delta_node = delta(first, last)
    s = jnp.zeros_like(i)
    t2 = -(-(last - first) // 2)  # ceil

    def split_body(_, carry):
        s, t2 = carry
        probe = first + s + t2
        ok = (probe < last) & (delta(first, probe) > delta_node)
        s = jnp.where(ok, s + t2, s)
        return s, jnp.maximum(-(-t2 // 2), 1)

    s, _ = jax.lax.fori_loop(0, 34, split_body, (s, t2))
    # (the split position gamma = first + s is implicit in the radix-tree
    # ranges; the sort-based DFS emission below never needs explicit
    # child pointers)

    # ---- assemble 2n-1 nodes: internal i -> [first, last]; leaf -> [k,k]
    starts = jnp.concatenate([first, jnp.arange(n, dtype=jnp.int32)])
    ends = jnp.concatenate([last, jnp.arange(n, dtype=jnp.int32)])
    sizes = ends - starts

    # preorder = sort by (start asc, size desc); two int32 keys (start*2n +
    # size would overflow int32 for very large n)
    _, _, dfs = jax.lax.sort(
        (starts, (n - sizes - 1).astype(jnp.int32),
         jnp.arange(2 * n - 1, dtype=jnp.int32)), num_keys=2)
    d_start = jnp.take(starts, dfs)
    d_end = jnp.take(ends, dfs)
    d_size = jnp.take(sizes, dfs)

    # skip = first DFS position whose start > end  (starts are sorted asc)
    skip = jnp.searchsorted(d_start, d_end + 1, side="left"
                            ).astype(jnp.int32)

    # ---- node AABBs: range min/max over sorted leaf boxes (sparse table)
    levels = max(int(np_ceil_log2(n)), 1)
    st_min = [lmin]
    st_max = [lmax]
    for k in range(levels):
        half = 1 << k
        prev_min, prev_max = st_min[-1], st_max[-1]
        shifted_min = jnp.concatenate(
            [prev_min[half:], jnp.full((half, 3), jnp.inf)], axis=0)
        shifted_max = jnp.concatenate(
            [prev_max[half:], jnp.full((half, 3), -jnp.inf)], axis=0)
        st_min.append(jnp.minimum(prev_min, shifted_min))
        st_max.append(jnp.maximum(prev_max, shifted_max))
    st_min = jnp.stack(st_min)   # (levels+1, n, 3)
    st_max = jnp.stack(st_max)

    span = d_size + 1
    k = jnp.clip(jnp.floor(jnp.log2(span.astype(jnp.float32))
                           ).astype(jnp.int32), 0, levels)
    right = jnp.maximum(d_end - (1 << k) + 1, 0)
    bmin = jnp.minimum(st_min[k, d_start], st_min[k, right])
    bmax = jnp.maximum(st_max[k, d_start], st_max[k, right])
    bounds = jnp.concatenate([bmin, bmax], axis=1)

    is_leaf = d_size == 0
    leaf_start = jnp.where(is_leaf, d_start, 0).astype(jnp.int32)
    leaf_count = is_leaf.astype(jnp.int32)

    return LinearBVH(bounds=bounds, leaf_start=leaf_start,
                     leaf_count=leaf_count, skip=skip, perm=perm)


def np_ceil_log2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return k


def node_cullable_flags_device(lin: LinearBVH, w_deg_mask: jnp.ndarray
                               ) -> jnp.ndarray:
    """jnp version of render.pallas_bvh.node_cullable_flags for jit-able
    per-frame rebuilds: 1.0 where a node's DFS subtree contains no
    degenerate (infinite-plane) wall. ``w_deg_mask``: (N,) bool per shape.
    """
    deg_leaf = jnp.where(lin.leaf_count > 0,
                         jnp.take(w_deg_mask.astype(jnp.int32),
                                  jnp.take(lin.perm,
                                           jnp.minimum(
                                               lin.leaf_start,
                                               lin.perm.shape[0] - 1))),
                         0)
    pref = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(deg_leaf)])
    m = lin.bounds.shape[0]
    sub = jnp.take(pref, lin.skip) - jnp.take(pref, jnp.arange(m))
    return (sub == 0).astype(jnp.float32)
