"""Shading math shared by all renderers.

Reference: phong in gpu_shader.comp:331-361 (GPU, with 1/distance light
attenuation) and src/main.cpp:553-581 (CPU, withOUT attenuation). Both use
``viewDir = ray.dir`` — the direction AWAY from the viewer — in the specular
term; this is a reference quirk that must be preserved to match images.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.geom.direct import reflect

BG_DARK = (0.05, 0.07, 0.1)
BG_SKY = (0.5, 0.7, 1.0)

# Shadowed surfaces are darkened x0.3, not black (gpu_shader.comp:491,591).
SHADOW_FACTOR = 0.3


def background(ndc_like_y: jnp.ndarray) -> jnp.ndarray:
    """Vertical gradient mix(dark, skyblue, y/H) (gpu_shader.comp:436).

    ``ndc_like_y`` is texel_y / H in [0, 1); returns (..., 3).
    """
    a = jnp.asarray(BG_DARK, jnp.float32)
    b = jnp.asarray(BG_SKY, jnp.float32)
    f = jnp.asarray(ndc_like_y, jnp.float32)[..., None]
    return a + (b - a) * f


def phong(point, normal, view_dir, light_pos, light_color,
          mat_color, ambient_k, diffuse_k, specular_k, shininess,
          attenuate: bool = True) -> jnp.ndarray:
    """Blinn-less Phong (gpu_shader.comp:331-361).

    attenuate=True  -> GPU variant: lightColor /= distance(light, point)
                       (1/d, not 1/d^2; gpu_shader.comp:339-340)
    attenuate=False -> CPU variant (main.cpp:553-581): no attenuation.

    All args broadcast; vectors are (..., 3), coefficients (...,).
    """
    to_light = light_pos - point
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_light * to_light, -1), 1e-30))
    lc = light_color / dist[..., None] if attenuate else jnp.broadcast_to(
        light_color, point.shape[:-1] + (3,))

    ambient = ambient_k[..., None] * lc

    light_dir = to_light / dist[..., None]
    diff = jnp.maximum(jnp.sum(normal * light_dir, -1), 0.0)
    diffuse = (diffuse_k * diff)[..., None] * lc

    # Specular only when diff > 0 (gpu_shader.comp:352).
    reflect_dir = reflect(-light_dir, normal)
    spec_cos = jnp.maximum(jnp.sum(view_dir * reflect_dir, -1), 0.0)
    spec = jnp.power(spec_cos, shininess)
    specular = jnp.where(diff > 0, specular_k * spec, 0.0)[..., None] * lc

    return (ambient + diffuse + specular) * mat_color


def fresnel_weight(new_dir, normal, fresnel_strength) -> jnp.ndarray:
    """Schlick-style factor evaluated with the REFLECTED direction
    (gpu_shader.comp:501-506): clamp((1 - max(dot(-newDir, n), 0))^5, 0, 0.8)
    scaled by the material's fresnelStrength."""
    cos = jnp.maximum(jnp.sum(-new_dir * normal, -1), 0.0)
    f = jnp.clip((1.0 - cos) ** 5, 0.0, 0.8)
    return fresnel_strength * f
