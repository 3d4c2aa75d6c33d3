"""Schedulability A/B for the triangle-test mix (VERDICT r2 item 1 /
NOTES_r3 lead 2): the production intersection mix achieves ~2.0e9
vreg-ops/s in situ vs 12-18e9 isolated op-class ceilings. Hypothesis:
Mosaic schedules the unrolled test bodies roughly in trace order, so
each test's internal dependence chain serializes. This measures
STAGE-INTERLEAVED variants (k independent rows' math emitted stage by
stage at trace time) against the production trace order, on a
control-free brute pass over every scene-1 triangle (no walk control
flow — rate is pure schedule).

Variants:
  fold        per-row sequential: test row fully, blend, next row
  tree<C>     chunked tree-reduce (brute_walk_ab's 2.0e9 baseline)
  ilp<K>      stage-interleaved groups of K rows, tree-blended
  ilp<K>f     stage-interleaved groups of K rows, fold-blended
  nodiv       ilp8 with the plane divide replaced by a multiply
              (diagnostic only: quantifies the divide's true cost)

Usage: python benchmarks/ilp_ab.py [--variants fold,tree32,ilp4,...]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import pallas_split, whitted
from raytracer_tpu.render.pallas_split import (
    _tri_test, _reduce_candidates, T_GID, T_NX, T_NY, T_NZ, T_PD,
    T_E1X, T_E1Y, T_E1Z, T_E2X, T_E2Y, T_E2Z, T_P1X,
    T_S0, T_S1, T_R11, T_R01, T_R00)
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.scenes import generate_scene1

TH, TW = 16, 128
W, H = 800, 600
# vector-op model: per-test ops counted from _tri_test (26) + 2 blend.
OPS_PER_TEST_VREGS = 28 * ((TH * TW) // (8 * 128))


def _tri_stage_batch(tri_ref, rows, ox, oy, oz, dx, dy, dz, nodiv=False):
    """_tri_test for a GROUP of rows, emitted stage by stage: every
    stage's ops for the k rows are adjacent in the jaxpr, so an in-order
    scheduler sees k independent instructions back to back."""
    k = len(rows)
    nx = [tri_ref[r, T_NX] for r in rows]
    ny = [tri_ref[r, T_NY] for r in rows]
    nz = [tri_ref[r, T_NZ] for r in rows]
    pd = [tri_ref[r, T_PD] for r in rows]
    d_n = [dx * nx[i] + dy * ny[i] + dz * nz[i] for i in range(k)]
    o_n = [ox * nx[i] + oy * ny[i] + oz * nz[i] for i in range(k)]
    if nodiv:
        t = [-(pd[i] + o_n[i]) * jnp.where(d_n[i] == 0, 1.0, d_n[i])
             for i in range(k)]
    else:
        t = [-(pd[i] + o_n[i]) / jnp.where(d_n[i] == 0, 1.0, d_n[i])
             for i in range(k)]
    inner = [(d_n[i] > 0) & (t[i] > 0) for i in range(k)]
    tw_ = [jnp.where(inner[i], t[i], 0.0) for i in range(k)]
    hx = [ox + tw_[i] * dx for i in range(k)]
    hy = [oy + tw_[i] * dy for i in range(k)]
    hz = [oz + tw_[i] * dz for i in range(k)]
    d20 = [hx[i] * tri_ref[rows[i], T_E1X] + hy[i] * tri_ref[rows[i], T_E1Y]
           + hz[i] * tri_ref[rows[i], T_E1Z] - tri_ref[rows[i], T_S0]
           for i in range(k)]
    d21 = [hx[i] * tri_ref[rows[i], T_E2X] + hy[i] * tri_ref[rows[i], T_E2Y]
           + hz[i] * tri_ref[rows[i], T_E2Z] - tri_ref[rows[i], T_S1]
           for i in range(k)]
    v = [tri_ref[rows[i], T_R11] * d20[i] - tri_ref[rows[i], T_R01] * d21[i]
         for i in range(k)]
    w = [tri_ref[rows[i], T_R00] * d21[i] - tri_ref[rows[i], T_R01] * d20[i]
         for i in range(k)]
    u = [1.0 - v[i] - w[i] for i in range(k)]
    ok = [inner[i] & ~((u[i] < 0) | (v[i] < 0) | (w[i] < 0))
          for i in range(k)]
    return t, ok


def _tri_test_gram(tri_ref, i, ox, oy, oz, dx, dy, dz):
    """Gram-FUSED barycentric test: per-tri constants Ev = r11*e1-r01*e2,
    cv = r11*s0-r01*s1 (and w-symmetric) are folded at pack time, so
    v = (o.Ev - cv) + t*(d.Ev) directly — no hit point, 12 scalar loads
    (vs 15) and ~4 fewer vector ops. Same accept set in exact arithmetic
    (reassociated in f32). Table columns: Ev at T_E1X.., cv at T_S0,
    Ew at T_E2X.., cw at T_S1 (see pack_gram_rows)."""
    nx = tri_ref[i, T_NX]
    ny = tri_ref[i, T_NY]
    nz = tri_ref[i, T_NZ]
    d_n = dx * nx + dy * ny + dz * nz
    o_n = ox * nx + oy * ny + oz * nz
    t = -(tri_ref[i, T_PD] + o_n) / jnp.where(d_n == 0, 1.0, d_n)
    inner = (d_n > 0) & (t > 0)
    d_ev = dx * tri_ref[i, T_E1X] + dy * tri_ref[i, T_E1Y] \
        + dz * tri_ref[i, T_E1Z]
    o_ev = ox * tri_ref[i, T_E1X] + oy * tri_ref[i, T_E1Y] \
        + oz * tri_ref[i, T_E1Z] - tri_ref[i, T_S0]
    v = o_ev + t * d_ev
    d_ew = dx * tri_ref[i, T_E2X] + dy * tri_ref[i, T_E2Y] \
        + dz * tri_ref[i, T_E2Z]
    o_ew = ox * tri_ref[i, T_E2X] + oy * tri_ref[i, T_E2Y] \
        + oz * tri_ref[i, T_E2Z] - tri_ref[i, T_S1]
    w = o_ew + t * d_ew
    inner = inner & (v >= 0) & (w >= 0) & ((v + w) <= 1.0)
    return t, inner


def pack_gram_rows(tri_rows, n_tri):
    """Repack tri rows with the Gram-fused constants in the e1/e2/s0/s1
    columns (other columns unchanged)."""
    tri = np.asarray(tri_rows).copy()
    e1 = tri[:n_tri, T_E1X:T_E1X + 3]
    e2 = tri[:n_tri, T_E2X:T_E2X + 3]
    s0 = tri[:n_tri, T_S0]
    s1 = tri[:n_tri, T_S1]
    r11 = tri[:n_tri, T_R11]
    r01 = tri[:n_tri, T_R01]
    r00 = tri[:n_tri, T_R00]
    tri[:n_tri, T_E1X:T_E1X + 3] = r11[:, None] * e1 - r01[:, None] * e2
    tri[:n_tri, T_S0] = r11 * s0 - r01 * s1
    tri[:n_tri, T_E2X:T_E2X + 3] = r00[:, None] * e2 - r01[:, None] * e1
    tri[:n_tri, T_S1] = r00 * s1 - r01 * s0
    return tri


def make_brute_kernel(variant, n_tri, tri_np=None):
    def kern(tri_ref, rays_ref, t_ref, gid_ref):
        if variant.startswith("const"):
            # bake every triangle constant as a float immediate: zero
            # scalar VMEM loads (diagnostic for the load-port hypothesis)
            tri_ref = pallas_split._ConstRows(tri_np)
        ox = rays_ref[0, 0]
        oy = rays_ref[1, 0]
        oz = rays_ref[2, 0]
        dx = rays_ref[3, 0]
        dy = rays_ref[4, 0]
        dz = rays_ref[5, 0]
        shape = ox.shape
        t_best = jnp.full(shape, INF, jnp.float32)
        g_best = jnp.full(shape, -1.0, jnp.float32)

        base = variant
        use_mt = False
        if variant.startswith("const"):
            base = variant[5:] or "tree32"
            if base.startswith("mt"):
                use_mt = True
                base = base[2:] or "tree32"
        elif variant.startswith("mt"):
            base = variant[2:] or "tree32"
            use_mt = True
        variant_ = base

        if variant_ == "fold":
            for row in range(n_tri):
                t, ok = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                  use_mt)
                better = ok & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                g_best = jnp.where(better, tri_ref[row, T_GID], g_best)
        elif variant_.startswith("tree"):
            chunk = int(variant_[4:])
            winners = []
            for lo in range(0, n_tri, chunk):
                cc = []
                for row in range(lo, min(lo + chunk, n_tri)):
                    t, ok = _tri_test(tri_ref, row, ox, oy, oz, dx, dy,
                                      dz, use_mt)
                    cc.append((jnp.where(ok, t, INF),
                               tri_ref[row, T_GID]))
                winners.append(_reduce_candidates(cc))
            best = _reduce_candidates(winners)
            better = best[0] < t_best
            t_best = jnp.where(better, best[0], t_best)
            g_best = jnp.where(better, best[1], g_best)
        elif variant_.startswith("ilp"):
            nodiv = False
            spec = variant_[3:] if not nodiv else "8"
            fold_blend = spec.endswith("f")
            k = int(spec[:-1] if fold_blend else spec)
            winners = []
            for lo in range(0, n_tri, k):
                rows = list(range(lo, min(lo + k, n_tri)))
                t, ok = _tri_stage_batch(tri_ref, rows, ox, oy, oz,
                                         dx, dy, dz, nodiv=nodiv)
                if fold_blend:
                    for i, row in enumerate(rows):
                        better = ok[i] & (t[i] < t_best)
                        t_best = jnp.where(better, t[i], t_best)
                        g_best = jnp.where(better, tri_ref[row, T_GID],
                                           g_best)
                else:
                    cc = [(jnp.where(ok[i], t[i], INF),
                           tri_ref[rows[i], T_GID])
                          for i in range(len(rows))]
                    winners.append(_reduce_candidates(cc))
            if winners:
                best = _reduce_candidates(winners)
                better = best[0] < t_best
                t_best = jnp.where(better, best[0], t_best)
                g_best = jnp.where(better, best[1], g_best)
        elif variant_.startswith("gram"):
            chunk = int(variant_[4:]) if variant_[4:] else 32
            winners = []
            for lo in range(0, n_tri, chunk):
                cc = []
                for row in range(lo, min(lo + chunk, n_tri)):
                    t, ok = _tri_test_gram(tri_ref, row, ox, oy, oz,
                                           dx, dy, dz)
                    cc.append((jnp.where(ok, t, INF),
                               tri_ref[row, T_GID]))
                winners.append(_reduce_candidates(cc))
            best = _reduce_candidates(winners)
            better = best[0] < t_best
            t_best = jnp.where(better, best[0], t_best)
            g_best = jnp.where(better, best[1], g_best)
        elif variant_ == "nodiv":
            winners = []
            for lo in range(0, n_tri, 8):
                rows = list(range(lo, min(lo + 8, n_tri)))
                t, ok = _tri_stage_batch(tri_ref, rows, ox, oy, oz,
                                         dx, dy, dz, nodiv=True)
                cc = [(jnp.where(ok[i], t[i], INF),
                       tri_ref[rows[i], T_GID]) for i in range(len(rows))]
                winners.append(_reduce_candidates(cc))
            best = _reduce_candidates(winners)
            better = best[0] < t_best
            t_best = jnp.where(better, best[0], t_best)
            g_best = jnp.where(better, best[1], g_best)
        else:
            raise ValueError(variant_)
        t_ref[0] = t_best
        gid_ref[0] = g_best
    return kern


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="tree32,ilp4,ilp8,ilp8f,nodiv")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    n_tri = split.n_tri

    o, d = cam_ops.camera_rays(sc.camera, W, H)
    bh, bw = _block_shape(TH * TW)
    hp, wp = -(-H // bh) * bh, -(-W // bw) * bw

    def to_blocks(x, fill):
        x = jnp.pad(x, ((0, hp - H), (0, wp - W), (0, 0)),
                    constant_values=fill)
        x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    o_b = to_blocks(o, whitted.PARK_ORIGIN)
    d_b = to_blocks(d, whitted._PARK_DIR)
    g = o_b.shape[0] // (TH * TW)
    rays = jnp.stack([o_b[:, 0], o_b[:, 1], o_b[:, 2],
                      d_b[:, 0], d_b[:, 1], d_b[:, 2]]) \
        .reshape(6, g, TH, TW)

    results = {}
    ref_out = None
    for variant in args.variants.split(","):
        base_v = variant[5:] if variant.startswith("const") else variant
        table = (jnp.asarray(pack_gram_rows(split.tri_rows, n_tri))
                 if base_v.startswith("gram") else split.tri_rows)
        kern = make_brute_kernel(variant, n_tri, np.asarray(table))
        fn = jax.jit(lambda r, k=kern, tb=table: pl.pallas_call(
            k,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(tb.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 1, TH, TW), lambda i: (0, i, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))
                       for _ in range(2)],
            out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                       for _ in range(2)],
        )(tb, r))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(rays))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(rays) for _ in range(args.reps)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        ops = g * n_tri * OPS_PER_TEST_VREGS
        rate = ops / (ms * 1e-3)
        exact = None
        if variant != "nodiv":
            if ref_out is None:
                ref_out = [np.asarray(x) for x in out]
            else:
                exact = bool((np.asarray(out[0]) == ref_out[0]).all())
        results[variant] = {"ms": round(ms, 3),
                            "vreg_ops_per_s": round(rate / 1e9, 2),
                            "compile_s": round(compile_s, 1),
                            "t_bitexact_vs_first": exact}
        print(json.dumps({variant: results[variant]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
