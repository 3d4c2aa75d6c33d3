"""Inverse rendering: fit scene parameters to target images by gradient
descent.

The reference has no differentiable path (its knobs are hand-tuned through
ImGui, src/main.cpp:373-431); differentiability is the headline capability
the TPU-native redesign adds on top. The whole pipeline — ray gen,
intersection, Whitted shading — is pure jnp, so jax.grad flows from pixels
back to sphere centers/radii, triangle vertices, materials, light and
camera pose. Non-differentiable discrete events (which shape is hit, shadow
on/off) follow the standard differentiable-rasterization convention: the
discrete decision is held fixed, gradients flow through the continuous
shading/geometry terms.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.render.reference import render as render_ref


def image_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over pixels."""
    diff = img - target
    return jnp.mean(diff * diff)


def image_loss_pyramid(img: jnp.ndarray, target: jnp.ndarray,
                       scales=(1, 4, 16)) -> jnp.ndarray:
    """Multi-scale MSE: the sum of MSEs over average-pooled copies of
    both images. Geometry fits need this: hit DECISIONS are
    stop-gradiented (kernel_vjp convention), so plain per-pixel MSE only
    carries shading gradients inside the overlap region — its best
    descent direction for a displaced object is often to SHRINK the
    mismatch area (push the object away) rather than translate it. The
    coarse scales blur the object into a blob whose pooled intensity
    moves smoothly with position, restoring a translation basin the
    silhouette-free gradient can follow. (H, W, 3) inputs; scales are
    pooling widths, 1 = the plain MSE term."""
    loss = jnp.float32(0.0)
    for s in scales:
        if s == 1:
            loss = loss + image_loss(img, target)
            continue
        a = jax.lax.reduce_window(img, 0.0, jax.lax.add,
                                  (s, s, 1), (s, s, 1), "VALID") / (s * s)
        b = jax.lax.reduce_window(target, 0.0, jax.lax.add,
                                  (s, s, 1), (s, s, 1), "VALID") / (s * s)
        loss = loss + image_loss(a, b)
    return loss


def make_loss_fn(scene: FlatScene, camera: Camera, light: Light,
                 cfg: RenderConfig, target: jnp.ndarray,
                 param_fields: Iterable[str],
                 renderer: Optional[Callable] = None) -> Callable:
    """Build loss(params) where params is a dict {field: array} of FlatScene
    fields (e.g. sphere_center, mat_color) being optimized; all other scene
    fields are closed over as constants.

    ``renderer(scene, camera, light, cfg) -> image`` selects the render
    path (default: the pure-XLA oracle). Pass ``make_kernel_renderer``'s
    result to optimize THROUGH the production Pallas kernel."""
    fields = tuple(param_fields)
    render_fn = renderer if renderer is not None else render_ref

    def loss(params: Dict[str, jnp.ndarray],
             light_params: Optional[Light] = None) -> jnp.ndarray:
        s = scene.replace(**params)
        lt = light_params if light_params is not None else light
        img = render_fn(s, camera, lt, cfg)
        return image_loss(img, target)

    loss.param_fields = fields
    return loss


def make_kernel_renderer(bvh, split0) -> Callable:
    """Renderer closure for optimizing through the PRODUCTION split
    kernel: every evaluation REFRESHES the prepared tables from the
    current (optimized) scene on device (update_dynamic: pre rows for
    moved spheres/walls + triangle rows with BVH refit), so hit
    decisions track the moving geometry across optimization steps — the
    moving-sphere analogue of the reference's per-frame updateScene +
    updateBVH (src/main.cpp:336-346, 981-992, 1068-1077).

    The refreshed tables are stop-gradiented: the kernel only DECIDES
    hits (discrete); gradients flow through the differentiable
    re-derivation (diff/kernel_vjp) against the live scene arrays."""
    from raytracer_tpu.render import pallas_split

    def render(s: FlatScene, camera, light, cfg) -> jnp.ndarray:
        sp = pallas_split.update_dynamic(split0, s)
        sp = jax.tree_util.tree_map(jax.lax.stop_gradient, sp)
        return pallas_split.render(s, bvh, camera, light, cfg, split=sp,
                                   differentiable=True)

    return render


@partial(jax.jit, static_argnames=("loss_fn", "lr"))
def _sgd_step(loss_fn, params, lr):
    val, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params,
                                        grads)
    return new_params, val


def fit_scene_params(scene: FlatScene, camera: Camera, light: Light,
                     cfg: RenderConfig, target: jnp.ndarray,
                     init_params: Dict[str, jnp.ndarray],
                     steps: int = 100, lr: float = 0.05,
                     optimizer=None,
                     renderer: Optional[Callable] = None,
                     ) -> Tuple[Dict[str, jnp.ndarray], list]:
    """Gradient-descent fit of the given FlatScene fields to ``target``.

    With ``optimizer`` (an optax GradientTransformation) uses that;
    otherwise plain SGD. ``renderer`` selects the render path (see
    make_loss_fn; pass make_kernel_renderer(...) for the production
    kernel). Returns (fitted params, loss history).
    """
    loss_fn = make_loss_fn(scene, camera, light, cfg, target,
                           init_params.keys(), renderer=renderer)
    params = dict(init_params)
    history = []

    if optimizer is not None:
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state):
            val, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            import optax
            params = optax.apply_updates(params, updates)
            return params, opt_state, val

        for _ in range(steps):
            params, opt_state, val = step(params, opt_state)
            history.append(float(val))
    else:
        for _ in range(steps):
            params, val = _sgd_step(loss_fn, params, lr)
            history.append(float(val))
    return params, history
