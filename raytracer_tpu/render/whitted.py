"""The Whitted bounce loop, shared by all JAX-level renderers.

Reference: the per-pixel loop of gpu_shader.comp:446-620 (both the BVH and
linear-scan branches run identical shading; they differ only in how the
closest hit is found and in the shadow epsilon). Here the loop is a
``lax.fori_loop`` over a whole wavefront of rays at once, parameterized by a
``closest_hit_fn`` so the brute-force oracle, the BVH wavefront renderer and
tests all share one shading implementation.

Quirks preserved (SURVEY.md §5 checklist):
- miss adds attenuation * background then terminates (gpu_shader.comp:454-458)
- shadow darkens by x0.3; occluded iff closest shadow-hit distance < light
  distance; shadow-ray origin offset 1e-3 (BVH) / 1e-5 (non-BVH)
- reflection only when specularStrength > 0; non-Fresnel attenuation *=
  specularStrength; Fresnel mode blends attenuation with mix(hitColor, 1, w)
  AND adds an extra (1-w)*hitColor*phongColor term (the reference's
  intentional double-count, gpu_shader.comp:495-516)
- ``viewDir`` passed to phong is ray.dir (points toward the surface)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Light, normalize
from raytracer_tpu.geom.direct import reflect
from raytracer_tpu.render import shading

ClosestHitFn = Callable[[jnp.ndarray, jnp.ndarray],
                        Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]

# Terminated lanes get parked on a ray that rejects every AABB/shape at the
# first test (origin far beyond the scene, pointing away): packet/wavefront
# traversals then spend zero iterations on dead lanes.
PARK_ORIGIN = 2e30
_PARK_DIR = 0.5773502691896258  # 1/sqrt(3): unit, no zero components

# perf-bisection flag: replace the per-hit gathers (materials, normals)
# with constants. NEVER leave off in production.
DEBUG_CONST_SHADE = False

# With cfg.sort_bounces: re-sort at EVERY bounce transition instead of
# once after bounce 1. v5e A/B: the extra per-bounce payload sort costs
# ~3.5ms and buys little locality (bounce-3 rays inherit bounce-2's
# clustering), so default off.
SORT_EVERY_BOUNCE = False


def _attr_table(scene: FlatScene) -> jnp.ndarray:
    """Packed (N, 16) shading-attribute table so the per-hit lookup is ONE
    row gather instead of ten separate jnp.take calls (separate gathers
    cost ~25ms/wave at 800x600 on v5e). Columns:
    [n(3), color(3), ka, kd, ks, kf, shininess, center(3), is_sphere]."""
    from raytracer_tpu.core.scene import SPHERE

    return jnp.concatenate([
        scene.plane_normal,
        scene.mat_color,
        scene.mat_ambient[:, None],
        scene.mat_diffuse[:, None],
        scene.mat_specular[:, None],
        scene.mat_fresnel[:, None],
        scene.mat_shininess[:, None],
        scene.sphere_center,
        (scene.shape_type == SPHERE).astype(jnp.float32)[:, None],
    ], axis=1)


def _bounce_sort_key(o: jnp.ndarray, d: jnp.ndarray,
                     live: jnp.ndarray) -> jnp.ndarray:
    """int32 coherence key for bounce-wave re-sorting: direction octant
    (3 bits) over a 7-bit/axis Morton code of the ray origin, quantized
    to the live-ray bounding box; parked lanes sort to the tail. 24 bits
    total — int32-safe (TPU jax runs without x64)."""
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    masked = jnp.where(live[:, None], o, jnp.nan)
    lo = jnp.nan_to_num(jnp.nanmin(masked, axis=0), nan=0.0)
    hi = jnp.nan_to_num(jnp.nanmax(masked, axis=0), nan=1.0)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / span * 127.0, 0.0, 127.0).astype(jnp.int32)
    m = jnp.zeros(o.shape[0], jnp.int32)
    for b in range(7):
        m = m | ((q[:, 0] >> b) & 1) << (3 * b + 2) \
            | ((q[:, 1] >> b) & 1) << (3 * b + 1) \
            | ((q[:, 2] >> b) & 1) << (3 * b)
    key = (octant << 21) | m
    return jnp.where(live, key, jnp.int32(1) << 30)


def trace(scene: FlatScene, light: Light, closest_hit_fn: ClosestHitFn,
          o: jnp.ndarray, d: jnp.ndarray, bg: jnp.ndarray,
          cfg: RenderConfig, occlusion_fn=None, fused_fn=None,
          resolve_fn=None) -> jnp.ndarray:
    """Trace R rays to completion. o, d, bg: (R, 3). Returns colors (R, 3).

    occlusion_fn(o, d, max_t) -> bool mask: optional any-hit query used for
    shadow rays instead of the closest-hit (identical result — occluded iff
    ANY INNER hit is closer than the light — but lets kernels terminate
    early).

    fused_fn(o, d, light_pos) -> (t, sid, hit, in_shadow): optional
    closest-hit that ALSO answers the shadow query in the same kernel
    launch (pallas_split._fused_kernel) — one launch per bounce instead
    of two. Takes precedence over occlusion_fn.

    resolve_fn(attr_tab, gid, p) -> (n, color, ka, kd, ks, kf, shininess):
    optional on-device replacement for the per-hit attribute-table gather
    (pallas_split.make_attr_resolver) — the XLA row gather costs
    ~3.2ms/wave at 800x600 on v5e, half the frame."""
    light_pos = light.position
    light_color = light.color
    shadow_eps = jnp.float32(cfg.shadow_eps)
    reflect_eps = jnp.float32(cfg.reflect_eps)

    accum = jnp.zeros_like(o)
    atten = jnp.ones_like(o)
    alive = jnp.ones(o.shape[:-1], dtype=bool)

    provides_attrs = getattr(closest_hit_fn, "provides_attrs", False)
    attr_tab = _attr_table(scene)

    use_fused = fused_fn is not None and cfg.enable_shadows

    def bounce(i, carry):
        o, d, atten, accum, alive, missed, ret = carry
        if use_fused:
            t, sid, hit, fused_shadow = fused_fn(o, d, light_pos)
        elif provides_attrs:
            t, sid, hit, attrs = closest_hit_fn(o, d)
        else:
            t, sid, hit = closest_hit_fn(o, d)

        # Miss: add attenuated background, terminate (comp:454-458).
        miss_now = alive & ~hit
        if cfg.sort_bounces:
            # background composited once at the end, in original order:
            # atten freezes when a lane dies, so recording the miss BIT
            # (1 sort column) is equivalent to adding atten*bg here (3)
            missed = missed | miss_now
        else:
            accum = accum + jnp.where(miss_now[..., None], atten * bg, 0.0)
        live = alive & hit

        p = o + t[..., None] * d
        if provides_attrs:
            # attributes emitted by the kernel — no XLA gathers
            n = attrs["normal"]
            mat_color = attrs["color"]
            k_a = attrs["ambient"]
            k_d = attrs["diffuse"]
            k_s = attrs["specular"]
            k_f = attrs["fresnel"]
            shin = attrs["shininess"]
        elif resolve_fn is not None:
            # attributes resolved on-device (distinct-sid loop) — no gather
            n, mat_color, k_a, k_d, k_s, k_f, shin = resolve_fn(
                attr_tab, sid.astype(jnp.float32), p)
        elif DEBUG_CONST_SHADE:
            n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p.shape)
            mat_color = jnp.ones_like(p)
            k_a = jnp.full(t.shape, 0.4)
            k_d = jnp.ones(t.shape)
            k_s = jnp.full(t.shape, 0.5)
            k_f = jnp.ones(t.shape)
            shin = jnp.full(t.shape, 32.0)
        else:
            row = jnp.take(attr_tab, sid, axis=0)      # ONE gather
            mat_color = row[:, 3:6]
            k_a = row[:, 6]
            k_d = row[:, 7]
            k_s = row[:, 8]
            k_f = row[:, 9]
            shin = row[:, 10]
            # normal: plane-family from the table; sphere from the hit point
            rel = p - row[:, 11:14]
            inv = jax.lax.rsqrt(jnp.sum(rel * rel, -1, keepdims=True)
                                + 1e-30)
            is_sph = row[:, 14:15]
            n = is_sph * (rel * inv) + (1.0 - is_sph) * row[:, 0:3]

        # Shadow ray (comp:466-480 / :562-580).
        if use_fused:
            in_shadow = fused_shadow
        elif cfg.enable_shadows:
            s_o = p + n * shadow_eps
            s_d = normalize(light_pos - p, eps=1e-30)
            light_dist = jnp.linalg.norm(light_pos - p, axis=-1)
            if occlusion_fn is not None:
                in_shadow = occlusion_fn(s_o, s_d, light_dist)
            else:
                # shadow rays don't need shading attributes — use the plain
                # closest-hit when the attrs variant exposes one
                shadow_fn = getattr(closest_hit_fn, "base", closest_hit_fn)
                if getattr(shadow_fn, "provides_attrs", False):
                    s_t, _, s_hit, _ = shadow_fn(s_o, s_d)
                else:
                    s_t, _, s_hit = shadow_fn(s_o, s_d)
                in_shadow = s_hit & (s_t < light_dist)
        else:
            in_shadow = jnp.zeros(t.shape, dtype=bool)

        color = shading.phong(p, n, d, light_pos, light_color, mat_color,
                              k_a, k_d, k_s, shin, attenuate=True)
        color = jnp.where(in_shadow[..., None],
                          color * shading.SHADOW_FACTOR, color)
        accum = accum + jnp.where(live[..., None], atten * color, 0.0)

        # Reflection (comp:495-516).
        spec_pos = k_s > 0
        new_d = reflect(d, n)
        new_o = p + n * reflect_eps
        cont = live & spec_pos

        if cfg.use_fresnel:
            w = shading.fresnel_weight(new_d, n, k_f)
            new_atten = atten * (mat_color + (1.0 - mat_color) * w[..., None])
            # NOTE: the extra term is NOT multiplied by attenuation in the
            # reference (gpu_shader.comp:510) — preserved verbatim.
            extra = (1.0 - w)[..., None] * mat_color * color
            accum = accum + jnp.where(cont[..., None], extra, 0.0)
        else:
            new_atten = atten * k_s[..., None]

        atten = jnp.where(cont[..., None], new_atten, atten)
        park_o = jnp.full_like(o, PARK_ORIGIN)
        park_d = jnp.full_like(d, _PARK_DIR)
        o = jnp.where(cont[..., None], new_o, park_o)
        d = jnp.where(cont[..., None], new_d, park_d)
        carry = (o, d, atten, accum, cont, missed, ret)

        if cfg.sort_bounces:
            # Re-pack the NEXT bounce's rays into coherent packets (and
            # compact parked lanes into whole parked tiles). Per-lane
            # results are permutation-invariant, so this is bit-exact;
            # per-ray state rides in sorted order and is un-sorted at
            # the end via ret.
            def do_sort(c):
                o, d, atten, accum, cont, missed, ret = c
                key = _bounce_sort_key(o, d, cont)
                # ONE multi-operand lax.sort carrying every per-ray
                # column as payload: inside the bounce loop XLA lowers
                # argsort+gather to serialized row gathers (~21.5 ms
                # EACH at 800x600 on v5e, profiler-measured) while the
                # sort network moves payload rows at full rate (~1 ms
                # per 3-4 columns).
                cols = (key,
                        o[:, 0], o[:, 1], o[:, 2],
                        d[:, 0], d[:, 1], d[:, 2],
                        atten[:, 0], atten[:, 1], atten[:, 2],
                        accum[:, 0], accum[:, 1], accum[:, 2],
                        missed.astype(jnp.int32), ret)
                s = jax.lax.sort(cols, dimension=0, num_keys=1,
                                 is_stable=True)
                pack3 = lambda a, b, c_: jnp.stack([a, b, c_], axis=-1)
                o2 = pack3(s[1], s[2], s[3])
                # liveness is recomputed from the park sentinel instead
                # of riding as an extra sort column
                return (o2, pack3(s[4], s[5], s[6]),
                        pack3(s[7], s[8], s[9]),
                        pack3(s[10], s[11], s[12]),
                        o2[:, 0] < 1e30, s[13].astype(bool), s[14])

            # Sort ONCE, after bounce 1 (the first divergent wave):
            # bounce-3 rays derive from sorted bounce-2 rays and inherit
            # most of the clustering; a per-bounce re-sort pays another
            # ~3.5ms for little extra locality (SORT_EVERY_BOUNCE A/B).
            last = cfg.max_bounces - 1
            do = (i < last) if SORT_EVERY_BOUNCE else \
                ((i == 0) & (last > 0))
            carry = jax.lax.cond(do, do_sort, lambda c: c, carry)
        return carry

    ret0 = jnp.arange(o.shape[0], dtype=jnp.int32)
    missed0 = jnp.zeros(o.shape[0], dtype=bool)
    _, _, atten, accum, _, missed, ret = jax.lax.fori_loop(
        0, cfg.max_bounces, bounce,
        (o, d, atten, accum, alive, missed0, ret0))
    if cfg.sort_bounces:
        # un-sort with one more payload sort keyed on the carried
        # original indices. Both a scatter (.at[ret].set, ~150ms) and an
        # argsort+gather (~9ms) lower to serialized row moves on TPU;
        # the sort network moves payload rows at full rate. atten and
        # the miss bit ride along so the deferred background composite
        # happens in ORIGINAL order against the un-permuted bg.
        s = jax.lax.sort(
            (ret, accum[:, 0], accum[:, 1], accum[:, 2],
             atten[:, 0], atten[:, 1], atten[:, 2],
             missed.astype(jnp.int32)),
            dimension=0, num_keys=1, is_stable=True)
        accum = jnp.stack([s[1], s[2], s[3]], axis=-1)
        atten = jnp.stack([s[4], s[5], s[6]], axis=-1)
        accum = accum + jnp.where(s[7].astype(bool)[..., None],
                                  atten * bg, 0.0)
    return accum
