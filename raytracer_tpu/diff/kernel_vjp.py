"""Differentiable wrapper around non-differentiable closest-hit kernels.

The Pallas kernels return (t, shape_id, hit) with no gradient path. The
standard differentiable-rendering convention (SURVEY.md §7.6) holds the
DISCRETE decisions fixed — which shape is hit, shadowed or not — and flows
gradients through the continuous geometry/shading terms. So:

  1. run the fast kernel, stop_gradient its (sid, hit);
  2. RE-DERIVE t by intersecting each ray with only its winning shape via
     geom.rowwise (pure jnp, differentiable w.r.t. every scene parameter
     through pack_rows);
  3. the Whitted loop then differentiates through hit points, normals and
     Phong exactly as it does for the oracle renderer.

Gradients computed this way match jax.grad of the brute-force oracle
wherever the discrete structure is locally constant (tests/test_grad.py).
The re-derivation costs O(R) — one shape per ray — vs the kernel's O(R * W)
traversal work, so the overhead is negligible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.geom import rowwise


def make_differentiable_closest(scene: FlatScene, fast_closest,
                                use_mt: bool = False):
    """Wrap a fast closest_hit(o, d) -> (t, sid, hit) so that the returned
    t carries gradients w.r.t. ``scene`` (closed over as a traced pytree).
    """
    rows = rowwise.pack_rows(scene)  # differentiable function of scene

    def closest(o, d):
        t_fast, sid, hit = fast_closest(jax.lax.stop_gradient(o),
                                        jax.lax.stop_gradient(d))
        sid = jax.lax.stop_gradient(sid)
        hit = jax.lax.stop_gradient(hit)
        row = jnp.take(rows, sid, axis=0)                 # (R, 24)
        t_diff, _ = rowwise.intersect_rows(row, o, d, use_mt)
        # guard: if the re-derived test disagrees (grazing fp edge), fall
        # back to the kernel t without gradient rather than produce junk
        ok = jnp.isfinite(t_diff) & (t_diff < 1e29)
        t = jnp.where(hit & ok, t_diff,
                      jax.lax.stop_gradient(t_fast))
        return t, sid, hit

    return closest
