"""Component-SoA variant of the Whitted loop for component-native kernels.

Identical semantics to render/whitted.py (reference gpu_shader.comp:446-620
quirks preserved — see that module's docstring), but every quantity is kept
as separate (R,) component arrays AND the closest-hit interface passes
components directly, so no (R, 3) tensor exists anywhere in the bounce
loop. Pairs with pallas_split.make_closest_hit's component entry points
(``closest_c`` / ``occlusion_c``).

Rationale: on TPU an (R, 3) array lane-pads 3 -> 128 (42x memory); a plain
SoA rewrite alone measured SLOWER because the kernel boundary re-packed
(R, 3) anyway — this variant eliminates the boundary too. A/B measured
against whitted.trace; see round-1 memory notes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Light
from raytracer_tpu.render import shading, whitted
from raytracer_tpu.render.whitted import _attr_table, PARK_ORIGIN, _PARK_DIR


def trace_c(scene: FlatScene, light: Light, closest_c, o, d, bg,
            cfg: RenderConfig, occlusion_c=None) -> jnp.ndarray:
    """Component-native trace. o, d, bg: (R, 3) at the interface; converted
    to components once. closest_c(ox,...,dz) -> (t, sid, hit);
    occlusion_c(ox,...,dz, max_t) -> bool."""
    lp = light.position
    lpx, lpy, lpz = lp[0], lp[1], lp[2]
    lc = light.color
    lcr, lcg, lcb = lc[0], lc[1], lc[2]
    shadow_eps = jnp.float32(cfg.shadow_eps)
    reflect_eps = jnp.float32(cfg.reflect_eps)
    attr_tab = _attr_table(scene)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    bgr, bgg, bgb = bg[:, 0], bg[:, 1], bg[:, 2]
    zero = jnp.zeros_like(ox)
    one = zero + 1.0

    state = (ox, oy, oz, dx, dy, dz, one, one, one, zero, zero, zero,
             jnp.ones(ox.shape, dtype=bool))

    def bounce(_, carry):
        (ox, oy, oz, dx, dy, dz, atr, atg, atb, acr, acg, acb,
         alive) = carry
        t, sid, hit = closest_c(ox, oy, oz, dx, dy, dz)

        miss = alive & ~hit
        acr = acr + jnp.where(miss, atr * bgr, 0.0)
        acg = acg + jnp.where(miss, atg * bgg, 0.0)
        acb = acb + jnp.where(miss, atb * bgb, 0.0)
        live = alive & hit

        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz

        row = jnp.take(attr_tab, sid, axis=0)          # ONE gather
        mcr, mcg, mcb = row[:, 3], row[:, 4], row[:, 5]
        k_a, k_d, k_s = row[:, 6], row[:, 7], row[:, 8]
        k_f, shin = row[:, 9], row[:, 10]
        rx = px - row[:, 11]
        ry = py - row[:, 12]
        rz = pz - row[:, 13]
        rinv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz + 1e-30)
        is_s = row[:, 14]
        nx = is_s * (rx * rinv) + (1.0 - is_s) * row[:, 0]
        ny = is_s * (ry * rinv) + (1.0 - is_s) * row[:, 1]
        nz = is_s * (rz * rinv) + (1.0 - is_s) * row[:, 2]

        tlx = lpx - px
        tly = lpy - py
        tlz = lpz - pz
        ldist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-30)
        linv = 1.0 / ldist
        ldx, ldy, ldz = tlx * linv, tly * linv, tlz * linv

        if cfg.enable_shadows:
            sx = px + nx * shadow_eps
            sy = py + ny * shadow_eps
            sz = pz + nz * shadow_eps
            if occlusion_c is not None:
                in_shadow = occlusion_c(sx, sy, sz, ldx, ldy, ldz, ldist)
            else:
                s_t, _, s_hit = closest_c(sx, sy, sz, ldx, ldy, ldz)
                in_shadow = s_hit & (s_t < ldist)
            shade_f = jnp.where(in_shadow, shading.SHADOW_FACTOR, 1.0)
        else:
            shade_f = 1.0

        ndl = nx * ldx + ny * ldy + nz * ldz
        diff = jnp.maximum(ndl, 0.0)
        rfx = -ldx + 2.0 * ndl * nx
        rfy = -ldy + 2.0 * ndl * ny
        rfz = -ldz + 2.0 * ndl * nz
        spec_cos = jnp.maximum(dx * rfx + dy * rfy + dz * rfz, 0.0)
        spec = jnp.where(diff > 0, k_s * jnp.power(spec_cos, shin), 0.0)
        base = (k_a + k_d * diff + spec) * linv * shade_f
        phr = base * lcr * mcr
        phg = base * lcg * mcg
        phb = base * lcb * mcb
        acr = acr + jnp.where(live, atr * phr, 0.0)
        acg = acg + jnp.where(live, atg * phg, 0.0)
        acb = acb + jnp.where(live, atb * phb, 0.0)

        spec_pos = k_s > 0
        ddn = dx * nx + dy * ny + dz * nz
        ndx = dx - 2.0 * ddn * nx
        ndy = dy - 2.0 * ddn * ny
        ndz = dz - 2.0 * ddn * nz
        cont = live & spec_pos

        if cfg.use_fresnel:
            cosr = jnp.maximum(-(ndx * nx + ndy * ny + ndz * nz), 0.0)
            f1 = 1.0 - cosr
            f2 = f1 * f1
            w = k_f * jnp.clip(f2 * f2 * f1, 0.0, 0.8)
            natr = atr * (mcr + (1.0 - mcr) * w)
            natg = atg * (mcg + (1.0 - mcg) * w)
            natb = atb * (mcb + (1.0 - mcb) * w)
            # extra term NOT attenuated (comp:510) — verbatim quirk
            acr = acr + jnp.where(cont, (1.0 - w) * mcr * phr, 0.0)
            acg = acg + jnp.where(cont, (1.0 - w) * mcg * phg, 0.0)
            acb = acb + jnp.where(cont, (1.0 - w) * mcb * phb, 0.0)
        else:
            natr, natg, natb = atr * k_s, atg * k_s, atb * k_s

        atr = jnp.where(cont, natr, atr)
        atg = jnp.where(cont, natg, atg)
        atb = jnp.where(cont, natb, atb)
        ox = jnp.where(cont, px + nx * reflect_eps, PARK_ORIGIN)
        oy = jnp.where(cont, py + ny * reflect_eps, PARK_ORIGIN)
        oz = jnp.where(cont, pz + nz * reflect_eps, PARK_ORIGIN)
        dx = jnp.where(cont, ndx, _PARK_DIR)
        dy = jnp.where(cont, ndy, _PARK_DIR)
        dz = jnp.where(cont, ndz, _PARK_DIR)
        return (ox, oy, oz, dx, dy, dz, atr, atg, atb, acr, acg, acb, cont)

    out = jax.lax.fori_loop(0, cfg.max_bounces, bounce, state)
    return jnp.stack([out[9], out[10], out[11]], axis=-1)
