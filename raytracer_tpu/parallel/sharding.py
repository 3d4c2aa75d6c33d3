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


def trace_sharded_strips(scene: FlatScene, split, camera: Camera,
                         light: Light, cfg: RenderConfig, mesh: Mesh):
    """The wholeframe PRODUCTION route under the mesh: the image is cut
    into horizontal strips of whole pixel-block rows, one strip per
    device, and each shard runs the EXACT single-chip production kernel
    configuration — in-kernel raygen and, with cfg.sort_bounces, the
    sorted-continuation hybrid (pallas_split._render_blocks) — on its
    strip. The strip's pixel-row offset rides the kernel's parameter row
    (par[0,20]), so every shard generates its strip's true global rays
    and backgrounds. Bit-exact vs the 1-device render: per-lane
    traversal and shading results are independent of both the strip
    decomposition and the per-strip sort grouping (packet composition
    never changes a lane's own result — the hybrid's own exactness
    argument). Matches the reference's one-kernel-everywhere property
    (gpu_shader.comp:433 runs identically for any dispatch sub-grid)."""
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.render.pallas_bvh import _block_shape

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    h, w = cfg.height, cfg.width
    bh, bw = _block_shape(cfg.tile_h * cfg.tile_w)
    n_bh = -(-h // bh)
    n_bh_pad = -(-n_bh // n_dev) * n_dev   # whole block-rows per device
    rows_per_dev = n_bh_pad // n_dev
    wp = -(-w // bw) * bw

    def shard_fn(scene_, split_, cam_, light_):
        idx = jax.lax.axis_index(axis)
        y_off = (idx * (rows_per_dev * bh)).astype(jnp.float32)
        return pallas_split._render_blocks(
            scene_, split_, cam_, light_, cfg,
            (rows_per_dev, wp // bw, bh, bw), y_off=y_off)

    out = shard_map(shard_fn, mesh=mesh,
                    in_specs=(P(), P(), P(), P()),
                    out_specs=P(axis), check_vma=False)(
        scene, split, camera, light)
    return out[:h, :w]


def _wholeframe_route_ok(cfg: RenderConfig, differentiable: bool) -> bool:
    """True iff the single-chip production router (_render_impl) would
    take a wholeframe in-kernel-raygen route for this config — the
    sharded strip path must make the identical choice so 8-dev and 1-dev
    renders run the same program."""
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.render.pallas_bvh import _block_shape

    bh, bw = _block_shape(cfg.tile_h * cfg.tile_w)
    use_wholeframe = (pallas_split.USE_WHOLEFRAME and not differentiable
                      and not pallas_split.USE_KERNEL_ATTRS
                      and not pallas_split.USE_OCCLUSION)
    raygen_ok = (pallas_split.USE_KERNEL_RAYGEN and bw & (bw - 1) == 0
                 and cfg.tile_w & (cfg.tile_w - 1) == 0)
    if not (use_wholeframe and raygen_ok):
        return False
    if not cfg.sort_bounces:
        return True
    hp = -(-cfg.height // bh) * bh
    wp = -(-cfg.width // bw) * bw
    return cfg.max_bounces >= 2 and hp * wp < 2 ** 24


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
    sharded over the mesh. (H, W, 3).

    Routes exactly like the single-chip production renderer: when
    _render_impl would take a wholeframe in-kernel-raygen route
    (including the cfg.sort_bounces sorted-continuation hybrid — the
    configuration behind the headline scene-2 number), the frame is
    strip-sharded and each device runs that same route on its strip
    (trace_sharded_strips); otherwise rays are fed through the
    per-bounce whitted.trace path as before (fed-rays kernels, the
    differentiable route)."""
    if _wholeframe_route_ok(cfg, differentiable):
        return trace_sharded_strips(scene, split, camera, light, cfg, mesh)
    h, w = cfg.height, cfg.width
    o, d, bg, n_rays = _frame_rays(camera, cfg, mesh.devices.size)
    colors = trace_sharded_split(scene, split, light, o, d, bg, cfg, mesh,
                                 differentiable=differentiable)
    return colors[:n_rays].reshape(h, w, 3)
