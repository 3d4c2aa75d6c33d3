"""Core value types: Material, Light, Camera.

These are registered pytrees so they flow through jit / grad / shard_map.
Scalars are kept as jnp arrays (not Python floats) so they are traceable and
differentiable — e.g. inverse rendering optimizes Material fields directly.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


@jax.tree_util.register_pytree_node_class
class Material:
    """Phong material.

    Reference: src/material.hpp:4-30 — defaults color (1,1,1),
    fresnelStrength 1.0, ambientStrength 0.4, diffuseStrength 1.0,
    specularStrength 0.5, shininess 32.

    ``shininess`` is an int in the reference but only ever used as the
    exponent of ``pow`` (gpu_shader.comp:354); we store it as f32.
    """

    def __init__(self, color=(1.0, 1.0, 1.0), fresnel=1.0, ambient=0.4,
                 diffuse=1.0, specular=0.5, shininess=32):
        self.color = _f32(color)
        self.fresnel = _f32(fresnel)
        self.ambient = _f32(ambient)
        self.diffuse = _f32(diffuse)
        self.specular = _f32(specular)
        self.shininess = _f32(shininess)

    def tree_flatten(self):
        return ((self.color, self.fresnel, self.ambient, self.diffuse,
                 self.specular, self.shininess), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.color, obj.fresnel, obj.ambient, obj.diffuse, obj.specular,
         obj.shininess) = children
        return obj

    def __repr__(self):
        return (f"Material(color={self.color}, fresnel={self.fresnel}, "
                f"ambient={self.ambient}, diffuse={self.diffuse}, "
                f"specular={self.specular}, shininess={self.shininess})")


@jax.tree_util.register_pytree_node_class
class Light:
    """Point light; effective color = intensity * base_color.

    Reference: src/light.hpp:6-35 (``updateColor``).
    """

    def __init__(self, position=(0.0, 0.0, 0.0), base_color=(1.0, 1.0, 1.0),
                 intensity=1.0):
        self.position = _f32(position)
        self.base_color = _f32(base_color)
        self.intensity = _f32(intensity)

    @property
    def color(self) -> jnp.ndarray:
        return self.intensity * self.base_color

    def tree_flatten(self):
        return ((self.position, self.base_color, self.intensity), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.position, obj.base_color, obj.intensity = children
        return obj

    def __repr__(self):
        return (f"Light(position={self.position}, base_color={self.base_color},"
                f" intensity={self.intensity})")


@jax.tree_util.register_pytree_node_class
class Camera:
    """Pinhole FPS camera: position + orthonormal (front, up, right) basis.

    Reference: src/camera.hpp:30-164. Defaults: yaw -90deg, pitch 0,
    fov 60deg, aspect 1, world-up (0,1,0). Note the reference world is
    effectively y-down (the UP key subtracts Up, camera.hpp:86-89); we keep
    the identical basis math so images match.

    Construction helpers (from_euler / look_at / ray generation / movement)
    live in :mod:`raytracer_tpu.core.camera` as pure functions.
    """

    def __init__(self, position, front, up, right, fov_deg=60.0, aspect=1.0):
        self.position = _f32(position)
        self.front = _f32(front)
        self.up = _f32(up)
        self.right = _f32(right)
        self.fov_deg = _f32(fov_deg)
        self.aspect = _f32(aspect)

    def tree_flatten(self):
        return ((self.position, self.front, self.up, self.right,
                 self.fov_deg, self.aspect), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.position, obj.front, obj.up, obj.right, obj.fov_deg,
         obj.aspect) = children
        return obj

    def __repr__(self):
        return (f"Camera(position={self.position}, front={self.front}, "
                f"up={self.up}, right={self.right}, fov={self.fov_deg}, "
                f"aspect={self.aspect})")


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """GLSL-style normalize. With eps=0 this matches glm/GLSL exactly
    (0/0 -> nan); pass a small eps for gradient-safe paths."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n
