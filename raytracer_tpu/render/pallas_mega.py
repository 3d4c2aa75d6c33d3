"""The full-Whitted Pallas megakernel: the ENTIRE frame in one kernel.

Ablation profiling (see round-1 logs / memory notes) showed the traversal
kernels cost ~3ms of a 59ms frame — the rest was the XLA-side per-wave
pipeline (ray packing, gathers, shading) repeated 6x per frame. This kernel
fuses everything: per ray tile it runs, entirely on-chip,

    for bounce in range(max_bounces):          # STATIC Python unroll
        closest-hit packet walk   (while loop, carries incl. shading attrs)
        shading + shadow-ray setup (straight-line vector code)
        occlusion packet walk      (while loop)
        phong + accumulate + reflect (straight-line vector code)

No control-flow nesting (Mosaic's compiler wedges on nested cond/fori in
while bodies — every loop here is top-level in the unrolled body), and the
closest walk carries the winning triangle's normal + material scalars so
no gather ever happens. XLA's only jobs per frame are camera ray
generation, the block remap, and one pallas_call.

Parity: same math as render/whitted.py + pallas_split (SURVEY.md §5
checklist); tests assert allclose against the wavefront renderer.

MEASURED OUTCOME (v5e, scene1 800x600x3): compiles in ~4s and is exactly
correct, but runs at 265ms/frame vs 59ms for pallas_split + the XLA-side
wave loop — the 12 attribute carries inflate every traversal iteration
(12 extra selects + register spills), outweighing the XLA overhead it
saves. Kept as a working design point; the production path remains
pallas_split. Round-2 leads: carry only (t, row) and resolve attributes
with a bounded re-walk, or shrink the attr set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.accel.linearize import LinearBVH
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene, SPHERE
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import shading, whitted
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.render.pallas_kernel import _auto_interpret
from raytracer_tpu.render.pallas_split import (
    SplitScene, _pre_intersect, _tri_test,
    G_GID, G_MCR, G_MCG, G_MCB, G_MKA, G_MKD, G_MKS, G_MKF, G_MSH,
    T_NX, T_NY, T_NZ, T_MCR, T_MCG, T_MCB, T_MKA, T_MKD, T_MKS, T_MKF,
    T_MSH)

# scalar-prefetch parameter vector layout
P_LPX, P_LPY, P_LPZ, P_LCR, P_LCG, P_LCB = 0, 1, 2, 3, 4, 5
PARAM_W = 6


def _aabb(nodes_ref, ptr, ox, oy, oz, ivx, ivy, ivz):
    b0x = nodes_ref[ptr, 0]
    b0y = nodes_ref[ptr, 1]
    b0z = nodes_ref[ptr, 2]
    b1x = nodes_ref[ptr, 3]
    b1y = nodes_ref[ptr, 4]
    b1z = nodes_ref[ptr, 5]
    tx0 = (b0x - ox) * ivx
    tx1 = (b1x - ox) * ivx
    ty0 = (b0y - oy) * ivy
    ty1 = (b1y - oy) * ivy
    tz0 = (b0z - oz) * ivz
    tz1 = (b1z - oz) * ivz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                   jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1))
    return tmin, (tmax >= tmin) & (tmax > 0)


def _advance(ptr, k, cnt, sk, entering, any_hit, is_leaf, in_leaf):
    k_next = k + 1
    leaf_done = in_leaf & (k_next >= cnt)
    go_deeper = entering & any_hit & jnp.logical_not(is_leaf)
    stay = (in_leaf & jnp.logical_not(leaf_done)).astype(jnp.int32)
    deeper = go_deeper.astype(jnp.int32)
    new_ptr = stay * ptr + (1 - stay) * (deeper * (ptr + 1)
                                         + (1 - deeper) * sk)
    return new_ptr, stay * k_next


def _mega_kernel(ls_ref, lc_ref, sk_ref, params_ref,
                 nodes_ref, pre_ref, tri_ref, rays_ref,
                 r_ref, g_ref, b_ref,
                 *, m, n_other, use_mt, use_fresnel, max_bounces,
                 enable_shadows, shadow_eps, reflect_eps):
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    bgr = rays_ref[6, 0]
    bgg = rays_ref[7, 0]
    bgb = rays_ref[8, 0]

    lpx = params_ref[P_LPX]
    lpy = params_ref[P_LPY]
    lpz = params_ref[P_LPZ]
    lcr = params_ref[P_LCR]
    lcg = params_ref[P_LCG]
    lcb = params_ref[P_LCB]

    shape = ox.shape
    zero = jnp.zeros(shape, jnp.float32)
    acr = acg = acb = zero
    atr = atg = atb = zero + 1.0
    live = zero + 1.0  # f32 mask

    for _bounce in range(max_bounces):
        aa = dx * dx + dy * dy + dz * dz
        ivx = 1.0 / dx
        ivy = 1.0 / dy
        ivz = 1.0 / dz

        # ---- closest-hit walk (pre-pass + triangle packet traversal),
        # carrying the winning hit's shading attributes -------------------
        t0v = jnp.full(shape, INF, jnp.float32)

        def pre_body(i, c):
            (t, nx, ny, nz, mcr, mcg, mcb, ka, kd, ks, kf, sh) = c
            ti, inner = _pre_intersect(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa, ivx, ivy, ivz, use_mt)
            better = inner & (ti < t)
            typ = pre_ref[i, 0]
            is_s = (typ == SPHERE).astype(jnp.float32)
            px = ox + ti * dx - pre_ref[i, 1]
            py = oy + ti * dy - pre_ref[i, 2]
            pz = oz + ti * dz - pre_ref[i, 3]
            inv = jax.lax.rsqrt(px * px + py * py + pz * pz + 1e-30)
            nxi = is_s * (px * inv) + (1.0 - is_s) * pre_ref[i, 5]
            nyi = is_s * (py * inv) + (1.0 - is_s) * pre_ref[i, 6]
            nzi = is_s * (pz * inv) + (1.0 - is_s) * pre_ref[i, 7]
            return (jnp.where(better, ti, t),
                    jnp.where(better, nxi, nx),
                    jnp.where(better, nyi, ny),
                    jnp.where(better, nzi, nz),
                    jnp.where(better, pre_ref[i, G_MCR], mcr),
                    jnp.where(better, pre_ref[i, G_MCG], mcg),
                    jnp.where(better, pre_ref[i, G_MCB], mcb),
                    jnp.where(better, pre_ref[i, G_MKA], ka),
                    jnp.where(better, pre_ref[i, G_MKD], kd),
                    jnp.where(better, pre_ref[i, G_MKS], ks),
                    jnp.where(better, pre_ref[i, G_MKF], kf),
                    jnp.where(better, pre_ref[i, G_MSH], sh))

        carry = (t0v,) + tuple(zero for _ in range(11))
        if n_other:
            carry = jax.lax.fori_loop(0, n_other, pre_body, carry)

        def c_cond(s):
            return s[0] < m

        def c_body(s):
            ptr, k = s[0], s[1]
            (t, nx, ny, nz, mcr, mcg, mcb, ka, kd, ks, kf, sh) = s[2:]
            entering = k == 0
            tmin, box_hit = _aabb(nodes_ref, ptr, ox, oy, oz, ivx, ivy, ivz)
            probe = box_hit & (tmin <= t)
            any_hit = jnp.any(probe)
            st = ls_ref[ptr]
            cnt = lc_ref[ptr]
            sk = sk_ref[ptr]
            is_leaf = cnt > 0
            start_leaf = entering & any_hit & is_leaf
            in_leaf = start_leaf | jnp.logical_not(entering)
            row = st + k
            ti, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                  use_mt)
            better = inner & in_leaf & (ti < t)
            out = (jnp.where(better, ti, t),
                   jnp.where(better, tri_ref[row, T_NX], nx),
                   jnp.where(better, tri_ref[row, T_NY], ny),
                   jnp.where(better, tri_ref[row, T_NZ], nz),
                   jnp.where(better, tri_ref[row, T_MCR], mcr),
                   jnp.where(better, tri_ref[row, T_MCG], mcg),
                   jnp.where(better, tri_ref[row, T_MCB], mcb),
                   jnp.where(better, tri_ref[row, T_MKA], ka),
                   jnp.where(better, tri_ref[row, T_MKD], kd),
                   jnp.where(better, tri_ref[row, T_MKS], ks),
                   jnp.where(better, tri_ref[row, T_MKF], kf),
                   jnp.where(better, tri_ref[row, T_MSH], sh))
            new_ptr, new_k = _advance(ptr, k, cnt, sk, entering, any_hit,
                                      is_leaf, in_leaf)
            return (new_ptr, new_k) + out

        s = jax.lax.while_loop(c_cond, c_body,
                               (jnp.int32(0), jnp.int32(0)) + carry)
        (t, nx, ny, nz, mcr, mcg, mcb, ka, kd, ks, kf, sh) = s[2:]
        hit = (t < INF).astype(jnp.float32) * live

        # miss: attenuated background; lane dies (comp:454-458)
        miss = live * (1.0 - (t < INF).astype(jnp.float32))
        acr = acr + miss * atr * bgr
        acg = acg + miss * atg * bgg
        acb = acb + miss * atb * bgb

        # ---- hit point + light geometry ---------------------------------
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        tlx = lpx - px
        tly = lpy - py
        tlz = lpz - pz
        ldist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-30)
        linv = 1.0 / ldist
        ldx, ldy, ldz = tlx * linv, tly * linv, tlz * linv

        # ---- shadow occlusion walk --------------------------------------
        if enable_shadows:
            sox = px + nx * shadow_eps
            soy = py + ny * shadow_eps
            soz = pz + nz * shadow_eps
            # parked for lanes with no hit: never probes
            dead = 1.0 - hit
            sox = sox + dead * whitted.PARK_ORIGIN
            soy = soy + dead * whitted.PARK_ORIGIN
            soz = soz + dead * whitted.PARK_ORIGIN
            sivx = 1.0 / ldx
            sivy = 1.0 / ldy
            sivz = 1.0 / ldz
            saa = ldx * ldx + ldy * ldy + ldz * ldz

            def s_pre(i, occ):
                ti, inner = _pre_intersect(pre_ref, i, sox, soy, soz,
                                           ldx, ldy, ldz, saa,
                                           sivx, sivy, sivz, use_mt)
                return jnp.where(inner & (ti < ldist), 1.0, occ)

            occ = zero
            if n_other:
                occ = jax.lax.fori_loop(0, n_other, s_pre, occ)

            def s_cond(s):
                return s[0] < m

            def s_body(s):
                ptr, k, occ = s
                entering = k == 0
                tmin, box_hit = _aabb(nodes_ref, ptr, sox, soy, soz,
                                      sivx, sivy, sivz)
                probe = box_hit & (occ == 0.0) & (tmin <= ldist)
                any_hit = jnp.any(probe)
                st = ls_ref[ptr]
                cnt = lc_ref[ptr]
                sk = sk_ref[ptr]
                is_leaf = cnt > 0
                start_leaf = entering & any_hit & is_leaf
                in_leaf = start_leaf | jnp.logical_not(entering)
                row = st + k
                ti, inner = _tri_test(tri_ref, row, sox, soy, soz,
                                      ldx, ldy, ldz, use_mt)
                occ = jnp.where(inner & in_leaf & (ti < ldist), 1.0, occ)
                new_ptr, new_k = _advance(ptr, k, cnt, sk, entering,
                                          any_hit, is_leaf, in_leaf)
                return new_ptr, new_k, occ

            _, _, occ = jax.lax.while_loop(
                s_cond, s_body, (jnp.int32(0), jnp.int32(0), occ))
            shade_f = 1.0 - (1.0 - shading.SHADOW_FACTOR) * occ
        else:
            shade_f = 1.0

        # ---- Phong (comp:331-361; viewDir = ray.dir quirk) --------------
        ndl = nx * ldx + ny * ldy + nz * ldz
        diff = jnp.maximum(ndl, 0.0)
        rfx = -ldx + 2.0 * ndl * nx
        rfy = -ldy + 2.0 * ndl * ny
        rfz = -ldz + 2.0 * ndl * nz
        spec_cos = jnp.maximum(dx * rfx + dy * rfy + dz * rfz, 0.0)
        spec = jnp.where(diff > 0, ks * jnp.power(spec_cos, sh), 0.0)
        base = (ka + kd * diff + spec) * linv * shade_f
        phr = base * lcr * mcr
        phg = base * lcg * mcg
        phb = base * lcb * mcb
        acr = acr + hit * atr * phr
        acg = acg + hit * atg * phg
        acb = acb + hit * atb * phb

        # ---- reflection (comp:495-516) ----------------------------------
        cont = hit * (ks > 0).astype(jnp.float32)
        ddn = dx * nx + dy * ny + dz * nz
        ndx = dx - 2.0 * ddn * nx
        ndy = dy - 2.0 * ddn * ny
        ndz = dz - 2.0 * ddn * nz

        if use_fresnel:
            cosr = jnp.maximum(-(ndx * nx + ndy * ny + ndz * nz), 0.0)
            f1 = 1.0 - cosr
            f2 = f1 * f1
            w = kf * jnp.clip(f2 * f2 * f1, 0.0, 0.8)
            natr = atr * (mcr + (1.0 - mcr) * w)
            natg = atg * (mcg + (1.0 - mcg) * w)
            natb = atb * (mcb + (1.0 - mcb) * w)
            # extra term NOT attenuated (comp:510)
            acr = acr + cont * (1.0 - w) * mcr * phr
            acg = acg + cont * (1.0 - w) * mcg * phg
            acb = acb + cont * (1.0 - w) * mcb * phb
        else:
            natr, natg, natb = atr * ks, atg * ks, atb * ks

        atr = cont * natr + (1.0 - cont) * atr
        atg = cont * natg + (1.0 - cont) * atg
        atb = cont * natb + (1.0 - cont) * atb
        dead = 1.0 - cont
        ox = cont * (px + nx * reflect_eps) + dead * whitted.PARK_ORIGIN
        oy = cont * (py + ny * reflect_eps) + dead * whitted.PARK_ORIGIN
        oz = cont * (pz + nz * reflect_eps) + dead * whitted.PARK_ORIGIN
        dx = cont * ndx + dead * whitted._PARK_DIR
        dy = cont * ndy + dead * whitted._PARK_DIR
        dz = cont * ndz + dead * whitted._PARK_DIR
        live = cont

    r_ref[0] = acr
    g_ref[0] = acg
    b_ref[0] = acb


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_impl(split: SplitScene, params, camera, light,
                 cfg: RenderConfig):
    h, w = cfg.height, cfg.width
    th, tw = cfg.tile_h, cfg.tile_w
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

    tile = th * tw
    bh, bw = _block_shape(tile)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw

    def to_blocks(x, fill=0.0):
        x = jnp.pad(x, ((0, hp - h), (0, wp - w), (0, 0)),
                    constant_values=fill)
        x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    o_b = to_blocks(o, fill=whitted.PARK_ORIGIN)
    d_b = to_blocks(d, fill=whitted._PARK_DIR)
    bg_b = to_blocks(bg)
    r = o_b.shape[0]
    g = r // tile
    rays = jnp.stack([o_b[:, 0], o_b[:, 1], o_b[:, 2],
                      d_b[:, 0], d_b[:, 1], d_b[:, 2],
                      bg_b[:, 0], bg_b[:, 1], bg_b[:, 2]])
    rays = rays.reshape(9, g, th, tw)

    kern = functools.partial(
        _mega_kernel, m=split.m, n_other=split.n_other, use_mt=cfg.use_mt,
        use_fresnel=cfg.use_fresnel, max_bounces=cfg.max_bounces,
        enable_shadows=cfg.enable_shadows,
        shadow_eps=cfg.shadow_eps, reflect_eps=cfg.reflect_eps)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.pre_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.tri_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 1, th, tw), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0))
                   for _ in range(3)],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((g, th, tw), jnp.float32)
                   for _ in range(3)],
        interpret=_auto_interpret(cfg),
    )(split.leaf_start, split.leaf_count, split.skip, params,
      *split.device_args()[3:], rays)

    colors = jnp.stack([x.reshape(-1) for x in outs], axis=-1)
    colors = colors.reshape(hp // bh, wp // bw, bh, bw, 3)
    colors = colors.transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)
    return colors[:h, :w]


def render(scene: FlatScene, bvh: LinearBVH, camera: Camera, light: Light,
           cfg: RenderConfig, split: SplitScene = None,
           tri_max_depth: int = 20) -> jnp.ndarray:
    """Render (H, W, 3): one Pallas kernel for the whole Whitted frame."""
    if split is None:
        split = SplitScene(scene, bvh, tri_max_depth)
    params = jnp.concatenate([light.position, light.color]).astype(
        jnp.float32)
    return _render_impl(split, params, camera, light, cfg)
