"""Multi-chip scale-out: shard the image plane over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2 parallelism inventory —
no NCCL/MPI, one dispatch). The TPU-native scaling axis is data parallelism
over pixels: rays are embarrassingly parallel, so we shard the ray dimension
across chips with shard_map, replicate the scene + BVH (a few hundred KB),
and let XLA insert the (trivial) collectives. Gradients of scene parameters
in inverse rendering are all-reduced by the shard_map transpose (a psum over
the mesh) — the analogue of gradient all-reduce in data-parallel training,
riding ICI.

Works identically on a real TPU slice and on the CPU
--xla_force_host_platform_device_count=N test mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 spells it jax.shard_map
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from raytracer_tpu.accel.linearize import LinearBVH
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom import batched, rowwise
from raytracer_tpu.render import shading, whitted, wavefront
from raytracer_tpu.render.reference import trace_chunked


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the first n_devices. For 2-D (host, chip)
    topologies the ray axis still shards over the flattened mesh."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


def trace_sharded(scene: FlatScene, light: Light, o, d, bg,
                  cfg: RenderConfig, mesh: Mesh,
                  bvh: Optional[LinearBVH] = None,
                  leaf_boxes=None) -> jnp.ndarray:
    """Trace R rays sharded over mesh axis 0. R must divide evenly by the
    mesh size (callers pad). Scene/BVH replicated on every device."""
    axis = mesh.axis_names[0]

    if bvh is not None:
        def shard_fn(scene_, bvh_, light_, o_, d_, bg_):
            rows = rowwise.pack_rows(scene_)
            rows_perm = jnp.take(rows, bvh_.perm, axis=0)
            closest = wavefront.make_closest_hit(bvh_, rows_perm, bvh_.perm,
                                                 cfg.use_mt)
            return whitted.trace(scene_, light_, closest, o_, d_, bg_, cfg)

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False,
        )(scene, bvh, light, o, d, bg)

    def shard_fn(scene_, light_, lb_, o_, d_, bg_):
        return trace_chunked(scene_, light_, o_, d_, bg_, cfg, lb_)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,
    )(scene, light, leaf_boxes, o, d, bg)


def trace_sharded_split(scene: FlatScene, split, light: Light, o, d, bg,
                        cfg: RenderConfig, mesh: Mesh,
                        differentiable: bool = False) -> jnp.ndarray:
    """The PRODUCTION path under the mesh: the split-phase Pallas kernel
    (render/pallas_split.py) traced per ray shard, scene + SplitScene
    replicated. Pallas runs natively per-device on TPU and in interpret
    mode on the CPU test mesh (_auto_interpret). With ``differentiable``,
    gradients flow via diff/kernel_vjp and transpose to a psum over the
    mesh — the data-parallel training step of inverse rendering."""
    from raytracer_tpu.render import pallas_split

    axis = mesh.axis_names[0]

    def shard_fn(scene_, split_, light_, o_, d_, bg_):
        closest = pallas_split.make_closest_hit(split_, cfg)
        fused = None
        if differentiable:
            from raytracer_tpu.diff.kernel_vjp import \
                make_differentiable_closest
            closest = make_differentiable_closest(scene_, closest,
                                                  cfg.use_mt)
        elif pallas_split.USE_FUSED_SHADOW and cfg.enable_shadows:
            fused = closest.fused_shadow
        return whitted.trace(scene_, light_, closest, o_, d_, bg_, cfg,
                             fused_fn=fused)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,
    )(scene, split, light, o, d, bg)


def _frame_rays(camera: Camera, cfg: RenderConfig, n_dev: int):
    """Flattened padded (o, d, bg) for a full frame, divisible by n_dev."""
    h, w = cfg.height, cfg.width
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    bg = bg.reshape(-1, 3)
    n_rays = o.shape[0]
    pad = (-n_rays) % n_dev
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        bg = jnp.pad(bg, ((0, pad), (0, 0)))
    return o, d, bg, n_rays


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def render_sharded(scene: FlatScene, camera: Camera, light: Light,
                   cfg: RenderConfig, mesh: Mesh,
                   bvh: Optional[LinearBVH] = None,
                   leaf_boxes=None) -> jnp.ndarray:
    """Full-frame render with pixels sharded over the mesh. (H, W, 3)."""
    h, w = cfg.height, cfg.width
    o, d, bg, n_rays = _frame_rays(camera, cfg, mesh.devices.size)
    colors = trace_sharded(scene, light, o, d, bg, cfg, mesh, bvh,
                           leaf_boxes)
    return colors[:n_rays].reshape(h, w, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh", "differentiable"))
def render_sharded_split(scene: FlatScene, split, camera: Camera,
                         light: Light, cfg: RenderConfig, mesh: Mesh,
                         differentiable: bool = False) -> jnp.ndarray:
    """Full-frame PRODUCTION render (split Pallas kernel) with pixels
    sharded over the mesh. (H, W, 3)."""
    h, w = cfg.height, cfg.width
    o, d, bg, n_rays = _frame_rays(camera, cfg, mesh.devices.size)
    colors = trace_sharded_split(scene, split, light, o, d, bg, cfg, mesh,
                                 differentiable=differentiable)
    return colors[:n_rays].reshape(h, w, 3)
