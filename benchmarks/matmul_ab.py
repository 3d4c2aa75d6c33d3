"""MXU-formulated triangle intersection A/B (round-3 perf lead).

Finding from ilp_ab.py: the broadcast-test mix runs AT the 4-ALU VPU
roofline once scalar loads are removed (const variant: ~3.8
vreg-ops/cycle) — no schedule fix can make it faster. The remaining
levers are fewer ops per ray-triangle pair and the idle MXU. This
prototypes the matmul formulation:

  rays as O4 = [o, 1], D4 = [d, 0]  (R, 4) matrices;
  per-triangle 4-vectors packed as three (4, T) rhs matrices:
    R_dn = [n; pd]       -> DN = D4 @ R_dn,  ONpd = O4 @ R_dn
    R_v  = [Ev; -c_v]    -> BV = D4 @ R_v,   AV   = O4 @ R_v
    R_w  = [Ew; -c_w]    -> BW = D4 @ R_w,   AW   = O4 @ R_w
  where Ev = r11*e1 - r01*e2, c_v = r11*s0 - r01*s1 (and w-symmetric),
  so v = AV + t*BV and w = AW + t*BW directly (one FMA each).

All six dot products ride the MXU; the VPU does ~17 elementwise ops per
(ray, triangle) pair on (R, T)-shaped arrays with triangles on lanes —
vs ~45 ops + ~15 scalar loads per pair for the broadcast test.

Measures a full brute pass over every scene-1 triangle (chunks of 128
lanes) against the tree32 broadcast baseline, and reports numerics
deltas (the MXU's f32 dot is not bit-identical to the VPU fma chain).

MEASURED RESULT (v5e, 2026-08-19): NEGATIVE. The MXU formulation is
correct (single-block check: hit set identical, gid agree 1.0, t rel
err <= 1.1e-6 at HIGHEST) but 3.2x SLOWER on the full frame: 33.2 ms
vs 10.27 ms for the broadcast tree32 baseline (19.5 vs 59.6 Gpairs/s).
Why it can't win: the per-pair accept/blend work (t-div, 4 compares,
3 selects on (R,128) arrays) is ~15 lane-ops/pair — the same as the
broadcast test's ~14 — so moving the 6 dot products to the MXU saves
nothing structural, and the tall (rays x tri-lane) layout adds matmul
dispatch + relayouts + a cross-lane min per block. The VPU broadcast
mix is already at its 4-ALU roofline (ilp_ab.py const variant), so
fewer ops per pair, not a different unit, is the only remaining lever.
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
    T_E1X, T_E2X, T_S0, T_S1, T_R11, T_R01, T_R00)
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.scenes import generate_scene1

TH, TW = 16, 128
W, H = 800, 600
CHUNK = 128           # triangles per matmul batch (= lane width)
ROWS = 512            # rays per MXU grid step (VMEM: ~20 live (R,128) f32)


def pack_tri_mats(tri_rows, n_tri):
    """(4, T) rhs matrices R_dn, R_v, R_w + gid row from packed tri rows.
    Zero-padded rows yield DN=0 (masked by the DN>0 test)."""
    tri = np.asarray(tri_rows)
    t_pad = max(((n_tri + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
    n = tri[:n_tri, T_NX:T_NX + 3].T                    # (3, n)
    pd = tri[:n_tri, T_PD]
    e1 = tri[:n_tri, T_E1X:T_E1X + 3].T
    e2 = tri[:n_tri, T_E2X:T_E2X + 3].T
    s0 = tri[:n_tri, T_S0]
    s1 = tri[:n_tri, T_S1]
    r11 = tri[:n_tri, T_R11]
    r01 = tri[:n_tri, T_R01]
    r00 = tri[:n_tri, T_R00]
    ev = r11 * e1 - r01 * e2
    cv = r11 * s0 - r01 * s1
    ew = r00 * e2 - r01 * e1
    cw = r00 * s1 - r01 * s0
    gid = tri[:n_tri, T_GID]

    def pad4(top3, last):
        m = np.zeros((4, t_pad), np.float32)
        m[:3, :n_tri] = top3
        m[3, :n_tri] = last
        return m

    r_dn = pad4(n, pd)
    r_v = pad4(ev, -cv)
    r_w = pad4(ew, -cw)
    g = np.full((1, t_pad), -1.0, np.float32)
    g[0, :n_tri] = gid
    return r_dn, r_v, r_w, g, t_pad


def mxu_kernel(rdn_ref, rv_ref, rw_ref, gid_ref, o4_ref, d4_ref,
               t_ref, g_ref, *, t_pad, precision):
    o4 = o4_ref[0]
    d4 = d4_ref[0]
    r = o4.shape[0]
    t_best = jnp.full((r, CHUNK), INF, jnp.float32)
    g_best = jnp.full((r, CHUNK), -1.0, jnp.float32)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=precision,
                            preferred_element_type=jnp.float32)
    for lo in range(0, t_pad, CHUNK):
        rdn = rdn_ref[:, lo:lo + CHUNK]
        rv = rv_ref[:, lo:lo + CHUNK]
        rw = rw_ref[:, lo:lo + CHUNK]
        dn = dot(d4, rdn)
        onpd = dot(o4, rdn)
        bv = dot(d4, rv)
        av = dot(o4, rv)
        bw = dot(d4, rw)
        aw = dot(o4, rw)
        t = -onpd / jnp.where(dn == 0, 1.0, dn)
        inner = (dn > 0) & (t > 0)
        v = av + t * bv
        w = aw + t * bw
        ok = inner & (v >= 0) & (w >= 0) & ((v + w) <= 1.0)
        tc = jnp.where(ok, t, INF)
        better = tc < t_best
        t_best = jnp.where(better, tc, t_best)
        gb = jnp.broadcast_to(gid_ref[:, lo:lo + CHUNK], (r, CHUNK))
        g_best = jnp.where(better, gb, g_best)
    tmin = jnp.min(t_best, axis=1, keepdims=True)
    gwin = jnp.min(jnp.where(t_best == tmin, g_best, 3.4e38), axis=1,
                   keepdims=True)
    t_ref[0] = tmin
    g_ref[0] = jnp.where(tmin < INF, gwin, -1.0)


def baseline_kernel(tri_ref, rays_ref, t_ref, gid_ref, *, n_tri):
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    shape = ox.shape
    t_best = jnp.full(shape, INF, jnp.float32)
    g_best = jnp.full(shape, -1.0, jnp.float32)
    winners = []
    for lo in range(0, n_tri, 32):
        cc = []
        for row in range(lo, min(lo + 32, n_tri)):
            t, ok = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz, False)
            cc.append((jnp.where(ok, t, INF), tri_ref[row, T_GID]))
        winners.append(_reduce_candidates(cc))
    best = _reduce_candidates(winners)
    better = best[0] < t_best
    t_ref[0] = jnp.where(better, best[0], t_best)
    gid_ref[0] = jnp.where(better, best[1], g_best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--precision", default="highest",
                    choices=["default", "highest"])
    args = ap.parse_args()
    precision = (jax.lax.Precision.HIGHEST
                 if args.precision == "highest"
                 else jax.lax.Precision.DEFAULT)

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
    tile = TH * TW
    g = o_b.shape[0] // tile

    # tile layout for the baseline
    rays = jnp.stack([o_b[:, 0], o_b[:, 1], o_b[:, 2],
                      d_b[:, 0], d_b[:, 1], d_b[:, 2]]) \
        .reshape(6, g, TH, TW)
    # matrix layout for the MXU kernel: per-tile (R, 4) in the SAME
    # lane order as the (16,128) tile (row-major), so outputs align
    gm = o_b.shape[0] // ROWS
    o4 = jnp.concatenate([o_b, jnp.ones((o_b.shape[0], 1))], axis=1) \
        .reshape(gm, ROWS, 4)
    d4 = jnp.concatenate([d_b, jnp.zeros((d_b.shape[0], 1))], axis=1) \
        .reshape(gm, ROWS, 4)

    r_dn, r_v, r_w, gid_row, t_pad = pack_tri_mats(split.tri_rows, n_tri)

    kern_m = functools.partial(mxu_kernel, t_pad=t_pad,
                               precision=precision)
    fn_mxu = jax.jit(lambda o4_, d4_: pl.pallas_call(
        kern_m,
        grid=(gm,),
        in_specs=[
            pl.BlockSpec((4, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, ROWS, 1), lambda i: (i, 0, 0))
                   for _ in range(2)],
        out_shape=[jax.ShapeDtypeStruct((gm, ROWS, 1), jnp.float32)
                   for _ in range(2)],
    )(jnp.asarray(r_dn), jnp.asarray(r_v), jnp.asarray(r_w),
      jnp.asarray(gid_row), o4_, d4_))

    kern_b = functools.partial(baseline_kernel, n_tri=n_tri)
    fn_base = jax.jit(lambda r: pl.pallas_call(
        kern_b,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(split.tri_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, TH, TW), lambda i: (0, i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))
                   for _ in range(2)],
        out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                   for _ in range(2)],
    )(split.tri_rows, r))

    def bench(fn, *xs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*xs))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(*xs) for _ in range(args.reps)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        return ms, compile_s, out

    ms_b, cs_b, out_b = bench(fn_base, rays)
    ms_m, cs_m, out_m = bench(fn_mxu, o4, d4)

    # both flatten row-major over the SAME o_b ray order
    t_b = np.asarray(out_b[0]).reshape(-1)
    g_b = np.asarray(out_b[1]).reshape(-1)
    t_m = np.asarray(out_m[0]).reshape(-1)
    g_m = np.asarray(out_m[1]).reshape(-1)
    live = t_b < INF
    rel = np.abs(t_m - t_b) / np.maximum(np.abs(t_b), 1e-20)
    pairs = g * tile * n_tri
    print(json.dumps({
        "baseline_ms": round(ms_b, 3),
        "mxu_ms": round(ms_m, 3),
        "speedup": round(ms_b / ms_m, 2),
        "gpairs_per_s_base": round(pairs / ms_b / 1e6, 1),
        "gpairs_per_s_mxu": round(pairs / ms_m / 1e6, 1),
        "precision": args.precision,
        "hit_agree_frac": float(np.mean((t_b < INF) == (t_m < INF))),
        "gid_agree_frac": float(np.mean(g_b == g_m)),
        "t_max_rel_err_on_hits": float(rel[live].max()) if live.any()
        else 0.0,
        "compile_s": {"base": round(cs_b, 1), "mxu": round(cs_m, 1)},
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
