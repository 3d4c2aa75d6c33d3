"""Inverse rendering example: recover a sphere's position and color from a
target image by gradient descent — the capability the reference's hand-tuned
ImGui material editor (src/main.cpp:384-429) hints at, made automatic.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/inverse.py
(or on TPU: python examples/inverse.py)

--kernel runs the fit THROUGH the production split kernel at full
scene-1 scale (800x600 on TPU): every step refreshes the prepared
tables from the current geometry (diff.make_kernel_renderer /
pallas_split.update_dynamic) so hit decisions track the moving sphere.
Writes INVERSE_kernel.json (loss curve + fwd/bwd wall times).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.diff import fit_scene_params, make_kernel_renderer
from raytracer_tpu.io import write_png
from raytracer_tpu.render.reference import render as render_ref


def main_kernel(steps: int, lr: float):
    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.diff.inverse import make_loss_fn
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.scenes import generate_scene1

    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    renderer = make_kernel_renderer(bvh, split)

    target = jax.block_until_ready(renderer(sc.flat, sc.camera, sc.light,
                                            cfg))
    write_png("inverse_kernel_target.png", np.asarray(target))

    # perturbation sized to the gradient basin: pixel-MSE gradients only
    # pull a displaced object back while its silhouette still overlaps
    # the target (the standard differentiable-rendering locality limit)
    init = {
        "sphere_center": sc.flat.sphere_center.at[0].add(
            jnp.array([1.2, -1.5, 0.9], jnp.float32)),
        "mat_color": sc.flat.mat_color.at[0].set(
            jnp.array([0.15, 0.7, 0.8], jnp.float32)),
    }
    write_png("inverse_kernel_init.png", np.asarray(
        renderer(sc.flat.replace(**init), sc.camera, sc.light, cfg)))

    # fit ONLY the perturbed sphere's parameters (a whole-array fit
    # with Adam drags every other shape's color off truth: Adam
    # normalizes the spurious early-mismatch gradients to full steps)
    from raytracer_tpu.diff.inverse import image_loss

    def with_params(p):
        return sc.flat.replace(
            sphere_center=sc.flat.sphere_center.at[0].set(p["center"]),
            mat_color=sc.flat.mat_color.at[0].set(p["color"]))

    def loss_fn(p):
        img = renderer(with_params(p), sc.camera, sc.light, cfg)
        return image_loss(img, target)

    p0 = {"center": init["sphere_center"][0], "color": init["mat_color"][0]}
    p_true = {"center": sc.flat.sphere_center[0],
              "color": sc.flat.mat_color[0]}

    # fwd / fwd+bwd wall times at full 800x600 through the kernel path
    fwd = jax.jit(loss_fn)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    jax.block_until_ready(fwd(p0))
    jax.block_until_ready(vg(p0))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(fwd(p0))
    fwd_ms = (time.perf_counter() - t0) / 10 * 1e3
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(vg(p0))
    fwdbwd_ms = (time.perf_counter() - t0) / 10 * 1e3

    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(p0)

    @jax.jit
    def step(p, st):
        val, g = jax.value_and_grad(loss_fn)(p)
        upd, st = opt.update(g, st, p)
        return optax.apply_updates(p, upd), st, val

    t0 = time.perf_counter()
    p, history = p0, []
    for _ in range(steps):
        p, opt_state, val = step(p, opt_state)
        history.append(float(val))
    fit_s = time.perf_counter() - t0
    params = {"sphere_center": sc.flat.sphere_center.at[0].set(p["center"]),
              "mat_color": sc.flat.mat_color.at[0].set(p["color"])}
    write_png("inverse_kernel_fit.png", np.asarray(
        renderer(sc.flat.replace(**params), sc.camera, sc.light, cfg)))

    # Loss floor: the target was rendered by the eager renderer while
    # the fit's forward is ONE fused program; eager-vs-fused f32
    # rounding of the prepared tables flips knife-edge discrete
    # decisions (a shadow/backface test on a quirk plane), leaving a
    # constant pixel-set mismatch that no parameter can remove. The
    # fit's success criterion is loss-above-floor + parameter recovery.
    loss_floor = float(fwd(p_true))
    out = {
        "config": "scene 1 (1240 shapes), 800x600, 3 bounces, production "
                  "split kernel, per-step update_dynamic refresh",
        "device": str(jax.devices()[0]),
        "steps": steps, "lr": lr,
        "fwd_ms": round(fwd_ms, 2),
        "fwd_bwd_ms": round(fwdbwd_ms, 2),
        "bwd_over_fwd": round(fwdbwd_ms / fwd_ms, 2),
        "fit_wall_s": round(fit_s, 1),
        "loss_first": history[0], "loss_last": history[-1],
        "loss_floor_at_true_params": loss_floor,
        "loss_curve": [round(h, 6) for h in history],
        "true_center": np.asarray(sc.flat.sphere_center[0]).tolist(),
        "recovered_center":
            np.asarray(params["sphere_center"][0]).tolist(),
        "true_color": np.asarray(sc.flat.mat_color[0]).tolist(),
        "recovered_color": np.asarray(params["mat_color"][0]).tolist(),
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "INVERSE_kernel.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "loss_curve"},
                     indent=1))
    excess0 = history[0] - loss_floor
    excess1 = history[-1] - loss_floor
    assert excess1 < 0.05 * excess0, \
        f"kernel-path fit did not converge: {excess1} vs {excess0}"
    err = np.linalg.norm(np.asarray(p["center"])
                         - np.asarray(p_true["center"]))
    assert err < 0.1, f"center not recovered: {err}"


def main_kernel_mesh(steps: int, lr: float):
    """Mesh-geometry + light inverse fit THROUGH the production kernel
    at full scene-1 scale (VERDICT r3 item 7): recover (a) a rigid
    translation of the 968-triangle monkey mesh — gradients flow through
    every vertex of every triangle row (update_dynamic tri-row refresh +
    kernel_vjp re-derivation) — and (b) the light position, from pixels
    alone. The reference can only hand-tune these live via ImGui
    (src/main.cpp:384-429); here they are recovered automatically.
    Writes INVERSE_kernel_r4.json."""
    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.diff.inverse import image_loss_pyramid
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.scenes import generate_scene1, meshgen

    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    renderer = make_kernel_renderer(bvh, split)

    # TWO monkey-facing viewpoints. With the kernel-vjp convention (hit
    # DECISIONS stop-gradiented), gradients exist only through shading
    # inside the overlap region — there are NO silhouette/size
    # gradients, so a single view cannot identify the view-ray (depth)
    # component of a translation: the measured failure mode is delta_z
    # walking away monotonically while x/y converge. A second camera
    # ~90 degrees around makes every translation direction in-plane for
    # at least one view. (The reference demo camera shows the monkey as
    # a sliver of edge-on pixels — no basin for any pixel loss.)
    cameras = [
        cam_ops.look_at(
            cam_ops.from_euler(position=(0.0, -6.0, -48.0), fov_deg=60,
                               aspect=cfg.width / cfg.height),
            (0.0, 0.0, -30.0)),
        cam_ops.look_at(
            cam_ops.from_euler(position=(-18.0, -6.0, -30.0), fov_deg=60,
                               aspect=cfg.width / cfg.height),
            (0.0, 0.0, -30.0)),
    ]

    # Monkey rows derived from the scene's shape-type layout (ADVICE r4:
    # scene 1 packs 4 spheres + the mirror wall BEFORE the first triangle,
    # so the monkey occupies SHAPE rows [6, 6+968), not [1, 969)). The
    # free triangle (generators.py adds it first) is triangle #0; the
    # monkey is the next n_monkey triangle ids.
    from raytracer_tpu.core.scene import TRIANGLE
    n_monkey = len(meshgen.monkey_mesh())
    tri_ids = np.nonzero(np.asarray(sc.flat.shape_type) == TRIANGLE)[0]
    monkey_ids = tri_ids[1:1 + n_monkey]
    mask = np.zeros((sc.flat.tri_p1.shape[0], 1), np.float32)
    mask[monkey_ids] = 1.0
    mask = jnp.asarray(mask)
    base = (sc.flat.tri_p1, sc.flat.tri_p2, sc.flat.tri_p3)

    def with_params(p):
        dm = mask * p["delta"]
        # recompute_tri_planes is REQUIRED for vertex gradients: plane t
        # and shading normals read the stored plane fields (a rigid
        # translation keeps n and only shifts d, but the general-edit
        # path is the one a user would take)
        s = sc.flat.replace(tri_p1=base[0] + dm, tri_p2=base[1] + dm,
                            tri_p3=base[2] + dm).recompute_tri_planes()
        light = Light(p["light"], sc.light.base_color, sc.light.intensity)
        return s, light

    true_light = np.asarray(sc.light.position)
    p_true = {"delta": jnp.zeros(3, jnp.float32),
              "light": jnp.asarray(true_light)}
    # target through the SAME forward path as the fit (recomputed
    # planes), so the loss floor is only the jit-fusion rounding
    s_t, l_t = with_params(p_true)
    targets = [jax.block_until_ready(renderer(s_t, c, l_t, cfg))
               for c in cameras]
    write_png("inverse_mesh_target.png", np.asarray(targets[0]))

    def loss_fn(p):
        s, light = with_params(p)
        loss = 0.0
        for c, t in zip(cameras, targets):
            img = renderer(s, c, light, cfg)
            loss = loss + image_loss_pyramid(img, t)
        return loss / len(cameras)

    # perturbation sized to the surrogate's validity region: hit
    # decisions are stop-gradiented, so the shading-only gradient is a
    # SURROGATE whose bias vs the true loss grows with displacement
    # (measured: from 0.8-unit displacements the joint fit reaches the
    # basin, then rides a surrogate-favored (mesh_x+, light_x+) gauge
    # direction uphill in the true loss)
    p0 = {"delta": jnp.array([0.4, -0.3, 0.25], jnp.float32),
          "light": jnp.asarray(true_light
                               + np.array([1.2, -1.0, 0.8], np.float32))}
    s0, l0 = with_params(p0)
    write_png("inverse_mesh_init.png",
              np.asarray(renderer(s0, cameras[0], l0, cfg)))

    import optax

    # Per-group Adam (mesh slow, light 5x faster): the two parameters
    # live on different time scales — the mesh delta converges in ~20
    # steps while the light (whose pixel gradient is diluted over the
    # whole image) needs ~2 units of travel; one shared lr either
    # crawls the light or overshoots the mesh. Cosine decay + clipping
    # then pin the joint iterate: the stop-gradiented hit decisions
    # make the gradient a SURROGATE whose (mesh_x+, light_x+) gauge
    # direction otherwise drifts uphill in the true loss once the
    # basin is reached (measured from 0.8-unit displacements).
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"slow": optax.adam(optax.cosine_decay_schedule(lr, steps)),
             "fast": optax.adam(
                 optax.cosine_decay_schedule(5 * lr, steps))},
            {"delta": "slow", "light": "fast"}))
    opt_state = opt.init(p0)

    # BLOCK COORDINATE DESCENT via runtime gradient masks (one compiled
    # step program): jointly descending both parameters measurably
    # fights itself — the mesh converges in ~20 steps, then drifts
    # along the surrogate gauge direction while the light is still
    # traveling. Phase 1 fits the mesh alone (robust to a wrong light),
    # phase 2 the light alone against the settled mesh, phase 3 a short
    # decayed joint polish.
    @jax.jit
    def step(p, st, mask):
        val, g = jax.value_and_grad(loss_fn)(p)
        g = {k: g[k] * mask[k] for k in g}
        upd, st = opt.update(g, st, p)
        return optax.apply_updates(p, upd), st, val

    n1 = steps // 3
    n2 = 2 * steps // 3

    def mask_at(i):
        if i < n1:
            return {"delta": 1.0, "light": 0.0}
        if i < n2:
            return {"delta": 0.0, "light": 1.0}
        return {"delta": 1.0, "light": 1.0}

    t0 = time.perf_counter()
    p, history, delta_hist, light_hist = p0, [], [], []
    best = (float("inf"), p0)
    for i in range(steps):
        if i in (n1, n2):
            # each phase restarts from the best iterate found so far
            # (the active block may have drifted past its optimum by
            # the end of its phase)
            p = best[1]
        p, opt_state, val = step(p, opt_state, mask_at(i))
        history.append(float(val))
        if history[-1] < best[0]:
            best = (history[-1], p)
        delta_hist.append(np.asarray(p["delta"]).tolist())
        light_hist.append(np.asarray(p["light"]).tolist())
    fit_s = time.perf_counter() - t0
    # best-iterate selection: the standard guard for surrogate-gradient
    # fits (the loss each step is the TRUE rendered loss, so the argmin
    # over the trajectory is well-defined and cheap to track)
    p = best[1]
    s_fit, l_fit = with_params(p)
    write_png("inverse_mesh_fit.png",
              np.asarray(renderer(s_fit, cameras[0], l_fit, cfg)))

    loss_floor = float(jax.jit(loss_fn)(p_true))
    delta_err = float(np.linalg.norm(np.asarray(p["delta"])))
    light_err = float(np.linalg.norm(np.asarray(p["light"]) - true_light))
    out = {
        "config": "scene 1 (968-tri monkey rigid translation + light "
                  "position), TWO 800x600 views, 3 bounces, production "
                  "split kernel, per-step update_dynamic refresh",
        "device": str(jax.devices()[0]),
        "steps": steps, "lr": lr, "fit_wall_s": round(fit_s, 1),
        "loss_first": history[0], "loss_last": history[-1],
        "loss_best": best[0],
        "best_step": int(np.argmin(history)),
        "loss_floor_at_true_params": loss_floor,
        "init_delta": np.asarray(p0["delta"]).tolist(),
        "recovered_delta": np.asarray(p["delta"]).tolist(),
        "delta_err": delta_err,
        "true_light": true_light.tolist(),
        "init_light": np.asarray(p0["light"]).tolist(),
        "recovered_light": np.asarray(p["light"]).tolist(),
        "light_err": light_err,
        "loss_curve": [round(h, 6) for h in history],
        "delta_curve": delta_hist[:: max(1, steps // 20)],
        "light_curve": light_hist[:: max(1, steps // 20)],
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "INVERSE_kernel_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.endswith("curve")}, indent=1))
    excess0 = history[0] - loss_floor
    excess1 = best[0] - loss_floor
    assert excess1 < 0.1 * excess0, \
        f"mesh+light fit did not converge: {excess1} vs {excess0}"
    assert delta_err < 0.15, f"mesh translation not recovered: {delta_err}"
    assert light_err < 0.5, f"light not recovered: {light_err}"


def main_kernel_deform(steps: int, lr: float):
    """NON-RIGID mesh inverse fit through the production kernel (VERDICT
    r4 item 7): recover a smooth PER-VERTEX deformation of the 968-tri
    monkey from three close-up rendered views, with Laplacian (umbrella)
    regularization over the welded vertex graph. Extends the rigid
    --kernel-mesh fit: every welded mesh vertex carries its own 3-vector
    offset (486x3 parameters).

    Optimization is STAGED SPSA over the true rendered loss (coarse
    basis -> full basis -> per-vertex polish): this problem is the
    measured breaking point of the analytic stop-gradient convention —
    the mesh is FLAT-shaded, so the photometric loss is dominated by
    facet-pattern re-assignment, which the silhouette-blind analytic
    gradient cannot see (four gradient-descent variants measured it
    pointing UPHILL in the true loss). SPSA probes the rendered loss
    directly (2 forwards/step, parameter-count-free) and sees the full
    signal. Recovery is reported for ALL vertices and for the OBSERVED
    subset (front-facing to some view AND lit — the far side of the
    mesh is constrained only through the smoothness priors). Writes
    INVERSE_deform_r5.json + PNGs."""
    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.core.scene import TRIANGLE
    from raytracer_tpu.diff.inverse import image_loss_pyramid
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.scenes import generate_scene1, meshgen

    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    renderer = make_kernel_renderer(bvh, split)

    # THREE close-up monkey views (~12-14 units; the monkey fills most
    # of the frame). Close views are what make per-vertex photometric
    # gradients usable here: the mesh is FLAT-shaded (per-triangle
    # geometric normals), so the within-triangle signal comes only from
    # the point light's 1/d attenuation and direction varying across
    # the surface — both scale with proximity — while each vertex's
    # pixel footprint grows ~25x vs the distant demo views (the distant
    # two-view fit measured a ~zero-signal stall).
    cameras = [
        cam_ops.look_at(
            cam_ops.from_euler(position=(0.0, -4.0, -44.0), fov_deg=60,
                               aspect=cfg.width / cfg.height),
            (0.0, 0.0, -30.0)),
        cam_ops.look_at(
            cam_ops.from_euler(position=(-11.0, -5.0, -37.0), fov_deg=60,
                               aspect=cfg.width / cfg.height),
            (0.0, 0.0, -30.0)),
        cam_ops.look_at(
            cam_ops.from_euler(position=(10.0, -3.0, -40.0), fov_deg=60,
                               aspect=cfg.width / cfg.height),
            (0.0, 0.0, -30.0)),
        # top-down view (y is up in the y-down world; the light sits
        # above, so the top surface is brightly lit): constrains the
        # toward-camera 'sloppy' deformation directions the three
        # side views barely see — without it the fit matches all side
        # views' appearance (loss -83%) while the depth components of
        # the vertex field stay wrong (measured)
        cam_ops.look_at(
            cam_ops.from_euler(position=(3.0, -16.0, -26.0), fov_deg=60,
                               aspect=cfg.width / cfg.height),
            (0.0, 0.0, -30.0)),
    ]

    # ---- weld the triangle soup into a vertex graph --------------------
    # FlatScene stores triangle soup (tri_p1/p2/p3 rows); per-vertex
    # deformation needs shared vertices. Weld by quantized position.
    n_monkey = len(meshgen.monkey_mesh())
    tri_ids = np.nonzero(np.asarray(sc.flat.shape_type) == TRIANGLE)[0]
    monkey_ids = tri_ids[1:1 + n_monkey]        # skip the free triangle
    corners = np.stack([np.asarray(sc.flat.tri_p1)[monkey_ids],
                        np.asarray(sc.flat.tri_p2)[monkey_ids],
                        np.asarray(sc.flat.tri_p3)[monkey_ids]],
                       axis=1)                   # (T, 3 corners, 3)
    flatc = corners.reshape(-1, 3)
    keys = np.round(flatc / 1e-4).astype(np.int64)
    _, vid_flat, counts = np.unique(keys, axis=0, return_inverse=True,
                                    return_counts=True)
    vid = vid_flat.reshape(-1, 3)                # (T, 3) vertex ids
    n_vert = int(vid_flat.max()) + 1
    base_vert = np.zeros((n_vert, 3), np.float32)
    base_vert[vid_flat] = flatc                  # last write wins (welded)

    # umbrella Laplacian from triangle edges: L x = sum_j (x_i - x_j)/deg
    edges = set()
    for t in range(vid.shape[0]):
        a, b, c = int(vid[t, 0]), int(vid[t, 1]), int(vid[t, 2])
        for e in ((a, b), (b, c), (c, a)):
            if e[0] != e[1]:
                edges.add((min(e), max(e)))
    edges = np.asarray(sorted(edges), np.int32)  # (E, 2)
    deg = np.zeros(n_vert, np.float32)
    np.add.at(deg, edges[:, 0], 1.0)
    np.add.at(deg, edges[:, 1], 1.0)
    ei = jnp.asarray(edges[:, 0])
    ej = jnp.asarray(edges[:, 1])
    degj = jnp.asarray(np.maximum(deg, 1.0))

    def laplacian(x):
        # (V, 3) -> (V, 3): x_i - mean over neighbors
        nbr_sum = (jnp.zeros((n_vert, 3), jnp.float32)
                   .at[ei].add(x[ej]).at[ej].add(x[ei]))
        return x - nbr_sum / degj[:, None]

    vid1 = jnp.asarray(vid[:, 0])
    vid2 = jnp.asarray(vid[:, 1])
    vid3 = jnp.asarray(vid[:, 2])
    mids = jnp.asarray(monkey_ids)
    base = (sc.flat.tri_p1, sc.flat.tri_p2, sc.flat.tri_p3)

    def with_offsets(off):
        p1 = base[0].at[mids].add(off[vid1])
        p2 = base[1].at[mids].add(off[vid2])
        p3 = base[2].at[mids].add(off[vid3])
        return sc.flat.replace(tri_p1=p1, tri_p2=p2,
                               tri_p3=p3).recompute_tri_planes()

    # ---- ground-truth deformation: a smooth sinusoidal warp ------------
    # Frequencies scaled to the MESH SIZE (the monkey spans ~+-9 units):
    # ~1 period across the mesh. The first attempt used ~1.0/unit
    # frequencies — THREE periods across the mesh, a high-frequency
    # wiggle that neither a smooth recovery basis nor flat-shaded
    # photometric gradients can see (measured stall).
    bv = jnp.asarray(base_vert)
    center = bv.mean(0)
    rel = bv - center
    true_off = jnp.stack([
        0.35 * jnp.sin(rel[:, 1] * 0.30),
        0.30 * jnp.cos(rel[:, 0] * 0.26),
        0.25 * jnp.sin(rel[:, 0] * 0.22 + rel[:, 1] * 0.18),
    ], axis=-1).astype(jnp.float32)
    true_rms = float(jnp.sqrt(jnp.mean(true_off ** 2)))

    s_t = with_offsets(true_off)
    targets = [jax.block_until_ready(renderer(s_t, c, sc.light, cfg))
               for c in cameras]
    write_png("inverse_deform_target.png", np.asarray(targets[0]))
    write_png("inverse_deform_init.png", np.asarray(
        renderer(with_offsets(jnp.zeros_like(true_off)), cameras[0],
                 sc.light, cfg)))

    lam = 0.5   # Laplacian weight: smoothness prior over the vertex graph

    def data_loss(off):
        s = with_offsets(off)
        loss = 0.0
        for c, t in zip(cameras, targets):
            img = renderer(s, c, sc.light, cfg)
            loss = loss + image_loss_pyramid(img, t)
        return loss / len(cameras)

    def loss_fn(off):
        data = data_loss(off)
        reg = jnp.mean(jnp.sum(laplacian(off) ** 2, -1))
        return data + lam * reg, (data, reg)

    # COARSE-TO-FINE IN PARAMETER SPACE: a raw per-vertex fit stalls —
    # each vertex's shading-gradient footprint is a handful of pixels,
    # so the per-coordinate signal is diluted ~500x (measured: 1% loss
    # decrease in 90 Adam steps). Phase 1 fits a GENERIC low-frequency
    # basis (quadratic polynomials + sin/cos at three generic
    # frequencies of the centered vertex coords — deliberately NOT the
    # truth's exact frequencies), whose ~100 coefficients each
    # aggregate gradient over the whole mesh; phase 2 polishes
    # per-vertex residuals under the Laplacian prior.
    feats = [jnp.ones(n_vert)]
    small = [0]            # column ids of the coarse sub-basis
    for a in range(3):
        small.append(len(feats))
        feats.append(rel[:, a])
        for b2 in range(a, 3):
            small.append(len(feats))
            feats.append(rel[:, a] * rel[:, b2])
        for w in (0.15, 0.3, 0.6):
            if w == 0.3:
                small += [len(feats), len(feats) + 1]
            feats.append(jnp.sin(rel[:, a] * w))
            feats.append(jnp.cos(rel[:, a] * w))
    # pairwise-sum/difference sinusoids cover oblique low-frequency
    # warps (the generic ladder brackets, not matches, the truth)
    for (a, b2) in ((0, 1), (0, 2), (1, 2)):
        for w in (0.2, 0.4):
            for sgn in (1.0, -1.0):
                u = rel[:, a] + sgn * rel[:, b2]
                if w == 0.2:
                    small += [len(feats), len(feats) + 1]
                feats.append(jnp.sin(w * u))
                feats.append(jnp.cos(w * u))
    B = jnp.stack(feats, axis=-1).astype(jnp.float32)     # (V, F)
    # unit-RMS columns: quadratic features reach ~|rel|^2 ~ 9, and
    # Adam's per-coordinate steps are scale-free — un-normalized
    # features turn a 0.05 first step into unit-scale vertex offsets
    # (measured blow-up)
    B = B / jnp.sqrt(jnp.mean(B ** 2, axis=0, keepdims=True) + 1e-12)
    nf = B.shape[1]

    import optax

    # SPSA (simultaneous-perturbation stochastic approximation) over
    # the TRUE rendered loss: the analytic photometric gradient is
    # silhouette-blind under the stop-gradient convention and, for a
    # FLAT-SHADED mesh whose loss is dominated by facet-pattern
    # re-assignment, points UPHILL in the true loss from the very first
    # step (measured across four gradient-descent variants, near and
    # far views, summed and annealed pyramids). SPSA probes the true
    # loss directly — two renders per step regardless of parameter
    # count — so it sees exactly the silhouette/assignment signal the
    # surrogate cannot. Phase 1 fits the basis coefficients; phase 2
    # polishes per-vertex offsets under the Laplacian prior.
    total_loss = jax.jit(lambda off: loss_fn(off)[0])

    def spsa_phase(loss_of, p, n, plr, delta, key, track_every=5):
        """SPSA + Adam. Tracks the exact loss every ``track_every``
        steps (each probe pair is already 2 renders; per-step tracking
        would cost a third)."""
        opt = optax.adam(optax.cosine_decay_schedule(plr, max(n, 1)))
        st = opt.init(p)
        hist, best = [], (float(loss_of(p)), p)
        for k in range(n):
            key, sub = jax.random.split(key)
            pert = jax.random.rademacher(
                sub, p.shape, dtype=jnp.float32)
            lp = float(loss_of(p + delta * pert))
            lm = float(loss_of(p - delta * pert))
            g = (lp - lm) / (2 * delta) * pert
            upd, st = opt.update(g, st, p)
            p = optax.apply_updates(p, upd)
            if k % track_every == track_every - 1 or k == n - 1:
                v = float(loss_of(p))
                hist.append(v)
                if v < best[0]:
                    best = (v, p)
            else:
                hist.append(min(lp, lm))
        return best, hist, key

    # Coarse sub-basis (recorded during construction): captures >99% of
    # any ~1-period smooth warp. Its 84 coefficients are few enough for
    # EXACT central finite differences — the strong signal the camera
    # fit also needed (SPSA's 1-probe gradient stalls at ~10% loss
    # reduction here; measured).
    Bs = B[:, jnp.asarray(small, jnp.int32)]

    t0 = time.perf_counter()
    loss_s = jax.jit(lambda C: loss_fn(Bs @ C)[0])
    loss_init = float(total_loss(jnp.zeros_like(true_off)))

    def fd_phase(loss_of, p, n, plr, h):
        """Central-FD gradient + Adam over a small coefficient matrix.
        2*size(p) true-loss evals per step."""
        opt = optax.adam(optax.cosine_decay_schedule(plr, max(n, 1)))
        st = opt.init(p)
        hist, best = [], (float(loss_of(p)), p)
        nf_, nax = p.shape
        for _ in range(n):
            g = np.zeros((nf_, nax), np.float32)
            for i in range(nf_):
                for a in range(nax):
                    e = jnp.zeros_like(p).at[i, a].set(h)
                    g[i, a] = (float(loss_of(p + e))
                               - float(loss_of(p - e))) / (2 * h)
            upd, st = opt.update(jnp.asarray(g), st, p)
            p = optax.apply_updates(p, upd)
            v = float(loss_of(p))
            hist.append(v)
            if v < best[0]:
                best = (v, p)
        return best, hist

    n_fd = max(10, min(25, steps // 40))
    (v1, C1), hist1 = fd_phase(
        loss_s, jnp.zeros((Bs.shape[1], 3), jnp.float32), n_fd, lr,
        h=0.02)
    # short per-vertex SPSA polish under the Laplacian prior (kept only
    # if it actually improves the true loss; SPSA random-walks the
    # unobserved far-side vertices, so it runs at a nominal step size)
    key = jax.random.PRNGKey(0)
    (v2, p2), hist2, key = spsa_phase(
        total_loss, Bs @ C1, max(steps // 8, 60), lr / 50.0,
        delta=0.005, key=key)
    history = hist1 + hist2
    best = (v2, p2) if v2 < v1 else (v1, Bs @ C1)
    fit_s = time.perf_counter() - t0
    p = best[1]
    write_png("inverse_deform_fit.png", np.asarray(
        renderer(with_offsets(p), cameras[0], sc.light, cfg)))

    # OBSERVED-vertex mask (geometric proxy): a vertex constrains the
    # photometric loss only if some incident triangle both faces a
    # camera and receives light (the monkey's far side is unlit AND
    # unseen from the three views; those vertices are reachable only
    # through the smooth-basis/Laplacian prior). Reported separately so
    # the recovery claim matches what the data can determine.
    tri_n = np.asarray(s_t.plane_normal)[np.asarray(mids)]
    tri_c = (np.asarray(s_t.tri_p1)[np.asarray(mids)]
             + np.asarray(s_t.tri_p2)[np.asarray(mids)]
             + np.asarray(s_t.tri_p3)[np.asarray(mids)]) / 3.0
    lp_ = np.asarray(sc.light.position)
    lit = (((lp_ - tri_c) * tri_n).sum(-1) > 0)
    seen = np.zeros(tri_n.shape[0], bool)
    for c in cameras:
        cp = np.asarray(c.position)
        seen |= (((cp - tri_c) * tri_n).sum(-1) > 0)
    obs_tri = lit & seen
    obs_v = np.zeros(n_vert, bool)
    for kcol in (np.asarray(vid1), np.asarray(vid2), np.asarray(vid3)):
        obs_v[kcol[obs_tri]] = True
    obs_v = jnp.asarray(obs_v)

    diff2 = (p - true_off) ** 2
    err_rms = float(jnp.sqrt(jnp.mean(diff2)))
    err_rms_obs = float(jnp.sqrt(
        jnp.sum(jnp.where(obs_v[:, None], diff2, 0.0))
        / (3 * jnp.maximum(jnp.sum(obs_v), 1))))
    init_rms = true_rms   # distance of the zero init from truth
    init_rms_obs = float(jnp.sqrt(
        jnp.sum(jnp.where(obs_v[:, None], true_off ** 2, 0.0))
        / (3 * jnp.maximum(jnp.sum(obs_v), 1))))
    out = {
        "config": "scene 1 monkey (968 tris, welded vertices): per-vertex "
                  "deformation + Laplacian reg, TWO 800x600 views, "
                  "production split kernel, per-step update_dynamic",
        "device": str(jax.devices()[0]),
        "n_vertices": n_vert, "n_edges": int(edges.shape[0]),
        "steps": steps, "lr": lr, "laplacian_weight": lam,
        "fit_wall_s": round(fit_s, 1),
        "loss_at_zero_init": loss_init,
        "loss_first": history[0], "loss_last": history[-1],
        "loss_best": best[0], "best_step": int(np.argmin(history)),
        "true_offset_rms": true_rms,
        "init_vertex_rms_err": init_rms,
        "recovered_vertex_rms_err": err_rms,
        "recovered_over_init": round(err_rms / init_rms, 4),
        "n_observed_vertices": int(jnp.sum(obs_v)),
        "init_vertex_rms_err_observed": init_rms_obs,
        "recovered_vertex_rms_err_observed": err_rms_obs,
        "recovered_over_init_observed": round(
            err_rms_obs / max(init_rms_obs, 1e-9), 4),
        "loss_curve": [round(h, 6) for h in history],
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "INVERSE_deform_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.endswith("curve")}, indent=1))
    # Success criteria match what this problem's physics lets a
    # photometric fit determine (measured across 12 optimization
    # variants, documented in NOTES_r5.md): the APPEARANCE is recovered
    # (>=70% of the photometric loss above the near-zero floor) and the
    # vertex field improves on the observed surface — but most of the
    # vertex rms lives in photometrically-SLOPPY directions (near-view-
    # ray motions of a flat-shaded mesh change almost no pixel), so
    # full vertex recovery is NOT claimed; the JSON reports both.
    assert best[0] < 0.3 * loss_init, \
        f"appearance not recovered: loss {best[0]} vs init {loss_init}"
    assert err_rms_obs < 0.95 * init_rms_obs, \
        (f"observed-surface vertex field did not improve: "
         f"{err_rms_obs} vs {init_rms_obs}")


def main_kernel_camera(steps: int, lr: float):
    """Camera-POSE inverse fit through the production kernel (VERDICT r4
    item 5): recover the camera position + yaw/pitch of scene 1's demo
    view from pixels alone. The reference's camera is driven by hand
    (WASD/mouse, src/camera.hpp:124-148); here the pose is recovered by
    gradient descent — the differentiable analogue of 'walk until the
    view matches'. Pose is parameterized exactly like the reference
    (position + Euler yaw/pitch, camera.hpp:21-26); the basis is rebuilt
    per step with the differentiable _vectors_from_euler chain. Writes
    INVERSE_camera_r5.json + PNGs."""
    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.diff.inverse import image_loss_pyramid
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.scenes import generate_scene1

    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    renderer = make_kernel_renderer(bvh, split)

    yaw_t, pitch_t = (float(v) for v in cam_ops.yaw_pitch_of(sc.camera))
    pos_t = np.asarray(sc.camera.position, np.float32)
    p_true = {"pos": jnp.asarray(pos_t), "yaw": jnp.float32(yaw_t),
              "pitch": jnp.float32(pitch_t)}

    def cam_of(p):
        return cam_ops.from_euler(position=p["pos"], yaw=p["yaw"],
                                  pitch=p["pitch"], fov_deg=60.0,
                                  aspect=cfg.width / cfg.height)

    target = jax.block_until_ready(
        renderer(sc.flat, cam_of(p_true), sc.light, cfg))
    write_png("inverse_camera_target.png", np.asarray(target))

    def make_loss(scales):
        def loss_fn(p):
            img = renderer(sc.flat, cam_of(p), sc.light, cfg)
            return image_loss_pyramid(img, target, scales=scales)
        return loss_fn

    # ANNEALED coarse-to-fine loss: camera error mostly SHIFTS the
    # image; the fine-level MSE gradient is silhouette-blind (hit
    # decisions are stop-gradiented) and systematically biased, and in
    # a SUMMED pyramid it swamps the coarse-level signal (measured:
    # summed (1,4,16[,64]) losses walk the pose AWAY from truth, both
    # joint and phased). Fitting the 64-px-pooled loss ALONE first
    # gives the wide, low-bias basin; finer levels only polish.
    phases = ((64,), (64, 16), (1, 4, 16, 64))
    loss_fn = make_loss(phases[-1])   # reported loss = full pyramid

    # perturbation: ~0.75 units of translation + ~1.5 degrees of look
    # direction — clearly visible (a ~20-pixel image shift)
    p0 = {"pos": jnp.asarray(pos_t + np.array([0.5, -0.4, 0.4],
                                              np.float32)),
          "yaw": jnp.float32(yaw_t + 1.5),
          "pitch": jnp.float32(pitch_t - 1.0)}
    write_png("inverse_camera_init.png",
              np.asarray(renderer(sc.flat, cam_of(p0), sc.light, cfg)))

    import optax

    # Joint Adam over (position, yaw, pitch) per annealing phase, with
    # per-phase decayed learning rates (the last phase grinds the
    # near-gauge valley's tiny parallax signal with small steps); the
    # reported history/best-iterate always score the FULL pyramid so
    # phases are comparable.
    steps_of = [steps // 3, steps // 4,
                steps - steps // 3 - steps // 4]
    phase_lrs = [lr, lr / 2.0, lr / 5.0]
    full_loss = jax.jit(loss_fn)

    def make_phase(scales, plr, n):
        phase_loss = make_loss(scales)
        opt = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(optax.cosine_decay_schedule(plr, max(n, 1))))

        @jax.jit
        def step(p, st):
            _, g = jax.value_and_grad(phase_loss)(p)
            upd, st = opt.update(g, st, p)
            return optax.apply_updates(p, upd), st

        return opt, step

    t0 = time.perf_counter()
    p, history = p0, [float(full_loss(p0))]
    best = (history[0], p0)
    for scales, plr, n in zip(phases, phase_lrs, steps_of):
        opt, step = make_phase(scales, plr, n)
        p = best[1]                       # restart from the best so far
        opt_state = opt.init(p)
        for _ in range(n):
            p, opt_state = step(p, opt_state)
            history.append(float(full_loss(p)))
            if history[-1] < best[0]:
                best = (history[-1], p)

    # FINITE-DIFFERENCE polish through the TRUE loss: the analytic
    # gradient is silhouette-blind (stop-gradiented hit decisions), and
    # at the basin floor the remaining pose error sits in a near-gauge
    # valley whose ~1e-3 photometric signal is EXACTLY the silhouette
    # re-assignment term the surrogate cannot see (measured: annealed
    # gradient descent stalls at ~0.2-0.4 units). Central differences
    # of the full rendered loss (10 extra forwards/step; rendering is
    # deterministic so FD is noise-free) descend that signal directly.
    def fd_grad(p, h_pos=0.03, h_ang=0.03):
        g = {}
        for kname, h in (("pos", h_pos), ("yaw", h_ang), ("pitch", h_ang)):
            v = p[kname]
            if v.ndim == 0:
                lp = float(full_loss({**p, kname: v + h}))
                lm = float(full_loss({**p, kname: v - h}))
                g[kname] = jnp.float32((lp - lm) / (2 * h))
            else:
                rows = []
                for a in range(3):
                    e = jnp.zeros(3, jnp.float32).at[a].set(h)
                    lp = float(full_loss({**p, kname: v + e}))
                    lm = float(full_loss({**p, kname: v - e}))
                    rows.append((lp - lm) / (2 * h))
                g[kname] = jnp.asarray(rows, jnp.float32)
        return g

    import optax as _ox

    n_fd = max(steps // 6, 30)
    fd_opt = _ox.adam(_ox.cosine_decay_schedule(0.02, n_fd))
    p = best[1]
    fd_state = fd_opt.init(p)
    for _ in range(n_fd):
        g = fd_grad(p)
        upd, fd_state = fd_opt.update(g, fd_state, p)
        p = _ox.apply_updates(p, upd)
        history.append(float(full_loss(p)))
        if history[-1] < best[0]:
            best = (history[-1], p)
    fit_s = time.perf_counter() - t0
    p = best[1]
    write_png("inverse_camera_fit.png",
              np.asarray(renderer(sc.flat, cam_of(p), sc.light, cfg)))

    loss_floor = float(jax.jit(loss_fn)(p_true))
    pos_err = float(np.linalg.norm(np.asarray(p["pos"]) - pos_t))
    yaw_err = abs(float(p["yaw"]) - yaw_t)
    pitch_err = abs(float(p["pitch"]) - pitch_t)
    out = {
        "config": "scene 1 camera pose (position + yaw/pitch), 800x600, "
                  "3 bounces, production split kernel",
        "device": str(jax.devices()[0]),
        "steps": steps, "lr": lr, "fit_wall_s": round(fit_s, 1),
        "loss_first": history[0], "loss_last": history[-1],
        "loss_best": best[0], "best_step": int(np.argmin(history)),
        "loss_floor_at_true_pose": loss_floor,
        "true_pos": pos_t.tolist(),
        "init_pos": np.asarray(p0["pos"]).tolist(),
        "recovered_pos": np.asarray(p["pos"]).tolist(),
        "pos_err": pos_err,
        "true_yaw_pitch": [yaw_t, pitch_t],
        "init_yaw_pitch": [float(p0["yaw"]), float(p0["pitch"])],
        "recovered_yaw_pitch": [float(p["yaw"]), float(p["pitch"])],
        "yaw_err_deg": yaw_err, "pitch_err_deg": pitch_err,
        "loss_curve": [round(h, 6) for h in history],
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "INVERSE_camera_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.endswith("curve")}, indent=1))
    assert pos_err < 0.05, f"camera position not recovered: {pos_err}"
    assert yaw_err < 0.05 and pitch_err < 0.05, \
        f"camera angles not recovered: {yaw_err}, {pitch_err}"


def main():
    cfg = RenderConfig(width=64, height=48, max_bounces=2, use_bvh=False,
                       ray_chunk=1024)
    b = SceneBuilder()
    b.add_sphere((0.3, -0.2, -5), 1.0, Material(color=(0.9, 0.2, 0.1),
                                                fresnel=0, specular=0.2))
    b.add_wall((-20, 2, -20), 40, 40, (0, 1, 0),
               Material(color=(0.4, 0.4, 0.7), specular=0))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=cfg.width / cfg.height)
    light = Light((0, -3, 0), (1, 1, 1), 6.0)

    target = render_ref(scene, cam, light, cfg)
    write_png("inverse_target.png", np.asarray(target))

    # perturb: wrong position and color
    init = {
        "sphere_center": scene.sphere_center.at[0].set(
            jnp.array([-0.4, 0.3, -4.5], jnp.float32)),
        "mat_color": scene.mat_color.at[0].set(
            jnp.array([0.2, 0.6, 0.8], jnp.float32)),
    }
    img0 = render_ref(scene.replace(**init), cam, light, cfg)
    write_png("inverse_init.png", np.asarray(img0))

    params, history = fit_scene_params(scene, cam, light, cfg, target, init,
                                       steps=200, lr=2.0)
    print(f"loss: {history[0]:.6f} -> {history[-1]:.6f}")
    print("recovered center:", np.asarray(params["sphere_center"][0]),
          "true:", np.asarray(scene.sphere_center[0]))
    print("recovered color:", np.asarray(params["mat_color"][0]),
          "true:", np.asarray(scene.mat_color[0]))

    img1 = render_ref(scene.replace(**params), cam, light, cfg)
    write_png("inverse_fit.png", np.asarray(img1))
    assert history[-1] < history[0] * 0.1, "optimization failed to converge"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", action="store_true",
                    help="fit through the production split kernel at "
                         "scene-1 scale (800x600; run on TPU)")
    ap.add_argument("--kernel-mesh", action="store_true",
                    help="mesh-translation + light-position fit through "
                         "the production kernel (800x600; run on TPU)")
    ap.add_argument("--kernel-camera", action="store_true",
                    help="camera-pose (position + yaw/pitch) fit through "
                         "the production kernel (800x600; run on TPU)")
    ap.add_argument("--kernel-deform", action="store_true",
                    help="per-vertex mesh deformation fit with Laplacian "
                         "regularization (800x600; run on TPU)")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=None)
    args = ap.parse_args()
    if args.kernel_deform:
        main_kernel_deform(args.steps,
                           args.lr if args.lr is not None else 0.03)
    elif args.kernel_camera:
        main_kernel_camera(args.steps,
                           args.lr if args.lr is not None else 0.02)
    elif args.kernel_mesh:
        main_kernel_mesh(args.steps,
                         args.lr if args.lr is not None else 0.05)
    elif args.kernel:
        main_kernel(args.steps, args.lr if args.lr is not None else 0.1)
    else:
        main()
