"""Checkpoint / resume for scenes and optimizer state.

The reference persists nothing but ImGui window geometry (imgui.ini;
SURVEY.md §5). Here scene + camera + light + arbitrary param pytrees are
flat arrays, so checkpointing is a plain npz round-trip (orbax is available
for heavy multi-host cases but npz keeps the dependency surface minimal and
is byte-stable for tests)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.scene import FlatScene, _FIELDS
from raytracer_tpu.core.types import Camera, Light


def save_scene(path: str, scene: FlatScene, camera: Camera = None,
               light: Light = None, extra: Dict[str, Any] = None) -> None:
    data = {f"scene.{f}": np.asarray(getattr(scene, f)) for f in _FIELDS}
    if camera is not None:
        for k in ("position", "front", "up", "right", "fov_deg", "aspect"):
            data[f"camera.{k}"] = np.asarray(getattr(camera, k))
    if light is not None:
        for k in ("position", "base_color", "intensity"):
            data[f"light.{k}"] = np.asarray(getattr(light, k))
    for k, v in (extra or {}).items():
        data[f"extra.{k}"] = np.asarray(v)
    np.savez(path, **data)


def load_scene(path: str) -> Tuple[FlatScene, Camera, Light,
                                   Dict[str, np.ndarray]]:
    z = np.load(path)
    scene = FlatScene(**{f: jnp.asarray(z[f"scene.{f}"]) for f in _FIELDS})
    camera = None
    if "camera.position" in z:
        camera = Camera(z["camera.position"], z["camera.front"],
                        z["camera.up"], z["camera.right"],
                        z["camera.fov_deg"], z["camera.aspect"])
    light = None
    if "light.position" in z:
        light = Light(z["light.position"], z["light.base_color"],
                      z["light.intensity"])
    extra = {k[len("extra."):]: z[k] for k in z.files
             if k.startswith("extra.")}
    return scene, camera, light, extra
