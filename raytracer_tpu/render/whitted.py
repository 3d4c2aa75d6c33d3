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

    def bounce(_, carry):
        o, d, atten, accum, alive = carry
        if use_fused:
            t, sid, hit, fused_shadow = fused_fn(o, d, light_pos)
        elif provides_attrs:
            t, sid, hit, attrs = closest_hit_fn(o, d)
        else:
            t, sid, hit = closest_hit_fn(o, d)

        # Miss: add attenuated background, terminate (comp:454-458).
        miss_now = alive & ~hit
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
        return o, d, atten, accum, cont

    _, _, _, accum, _ = jax.lax.fori_loop(
        0, cfg.max_bounces, bounce, (o, d, atten, accum, alive))
    return accum
