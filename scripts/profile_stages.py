"""Per-stage TPU timing of the bench frame.

Times each pipeline stage as a separately-jitted function on realistic
intermediate data (taken from one real forward pass), mirroring the
reference's per-stage CSV report (`REF/main.cpp:260-374`: GB, Sampling,
Optimize, Shading, JFA, SI, PPI, AT, Total).

TIMING METHOD (round-4 rewrite — the round-3 profile reported 0.07 ms
for a kernel whose HBM traffic alone needs >0.2 ms):
  - every timed function is wrapped so the jit returns ONE scalar that
    depends on EVERY output leaf (sum of sums) — nothing can be DCE'd,
    and the block is a single scalar readback;
  - each stage is timed at two iteration counts; if the per-iter times
    disagree by >20% the row is marked unstable (dispatch latency on the
    remote-tunnel TPU is ~9 ms/call, so sub-ms kernels need the larger
    count to amortize);
  - the per-stage table carries the stage's ray count and Mrays/s so
    each row can be sanity-checked against the ~800 GB/s HBM roofline
    (134 MB of packed ray IO at 2.1 M rays -> >=0.2 ms floor).

Usage: python scripts/profile_stages.py [--width 1920 --height 1088]
Writes a markdown table to stdout and PROFILE_STAGES.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores JAX_PLATFORMS; honor it via jax.config
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _scalarize(fn):
    """Wrap fn so it returns one f32 scalar depending on every leaf."""

    def wrapped(*args):
        out = fn(*args)
        tot = jnp.float32(0.0)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "dtype"):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    return wrapped


def timeit(fn, *args, iters=16, warmup=2, name=""):
    """Time a jitted scalar-returning fn. Returns (ms, stable)."""
    f = jax.jit(_scalarize(fn))
    t0 = time.perf_counter()
    out = f(*args)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        f(*args).block_until_ready()

    def run(k):
        t0 = time.perf_counter()
        s = None
        for _ in range(k):
            s = f(*args)
        s.block_until_ready()
        return (time.perf_counter() - t0) / k * 1e3

    ms_a = run(max(2, iters // 4))
    ms_b = run(iters)
    stable = abs(ms_a - ms_b) <= 0.2 * max(ms_a, ms_b, 1e-9)
    print(f"[profile] {name:24s} {ms_b:9.2f} ms   "
          f"({'stable' if stable else f'UNSTABLE {ms_a:.2f}/{ms_b:.2f}'}, "
          f"compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
    return ms_b, stable


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--scene", default="earth")
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--quick", action="store_true",
                   help="skip sibson + isolated-kernel rows")
    args = p.parse_args()

    from fovtrace import Camera, RenderConfig
    from fovtrace.kernels import atrous, jfa, pullpush, saliency, sampling
    from fovtrace.render import gbuffer as gbuffer_mod
    from fovtrace.render import pipeline
    from fovtrace.render import shade as shade_mod
    from fovtrace.core import rng, vec
    from fovtrace.kernels import intersect as isect
    from fovtrace.scene import procedural

    # bench-identical config (bench.py): minimal outputs, atrous recon
    config = RenderConfig(
        width=args.width, height=args.height, reconstruction="atrous",
        max_depth=4, diffuse_max_depth=1, ray_budget_frac=0.30,
        full_outputs=False,
    )
    w, h = config.width, config.height
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))
    n_pix = h * w
    budget = config.ray_budget
    print(f"[profile] scene={args.scene} tris={scene.num_triangles} "
          f"{w}x{h} budget={budget} device={jax.devices()[0]}",
          file=sys.stderr, flush=True)

    rows = []  # (name, ms, stable, rays) — rays=None for non-ray stages

    def add(name, ms_stable, rays=None):
        ms, stable = ms_stable
        rows.append((name, ms, stable, rays))

    # ---- materialize realistic intermediates from one forward pass -----
    fwd = jax.jit(
        lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config))
    out, state1 = fwd(scene, cam, gaze, state)
    jax.block_until_ready(out["image_rgb"])
    out2, state2 = fwd(scene, cam, gaze, state1)
    jax.block_until_ready(out2["image_rgb"])

    gbuf = jax.jit(
        lambda s, c, pc: gbuffer_mod.trace_gbuffer(s, c, pc, w, h, config)
    )(scene, cam, state2.prev_camera)
    jax.block_until_ready(jax.tree.leaves(gbuf))

    # ---- isolated kernels ----------------------------------------------
    # rays TILE-SWIZZLED like the pipeline's (scanline order makes the
    # kernel's 256-ray bundles span whole rows -> ~3x slower, which is
    # NOT what the pipeline pays)
    if not args.quick:
        from fovtrace.render.gbuffer import swizzle_to_tiles

        rov, rdv = cam.primary_rays_v(w, h)
        sw = lambda a: swizzle_to_tiles(a.reshape(-1), h, w)
        ro_f = rov.map(sw)
        rd_f = rdv.map(sw)
        jax.block_until_ready((ro_f.x, rd_f.x))

        add(f"gb_intersect_{n_pix//10**6}Mray", timeit(
            lambda o, d: isect.intersect_v(
                scene, o, d, config.scene_epsilon, isect.BIG_T),
            ro_f, rd_f, iters=args.iters, name="gb_intersect"), n_pix)
        add(f"gb_occlusion_{n_pix//10**6}Mray", timeit(
            lambda o, d: isect.occlusion_v(
                scene, o, d, config.scene_epsilon, isect.BIG_T),
            ro_f, rd_f, iters=args.iters, name="gb_occlusion"), n_pix)

    add("gbuffer_total", timeit(
        lambda s, c, pc: gbuffer_mod.trace_gbuffer(s, c, pc, w, h, config),
        scene, cam, state2.prev_camera, iters=args.iters, name="gbuffer"),
        2 * n_pix)

    # ---- sampling: saliency + mask + compaction -------------------------
    bbox_diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)

    def f_sampling(gbuf_, frame):
        sal = saliency.compute_saliency(gbuf_, gaze, bbox_diag,
                                        config.saliency_block)
        gdist = sampling.gaze_distance(h, w, gaze)
        mask = sampling.masked_sampling(
            h, w, gdist, sal, config.aperture, config.extra_sample_rate)
        # the pipeline's tile-order compaction (coherent shade bundles)
        idx, active, rank, gate = pipeline.stage_compact(mask, config)
        return sal, mask, idx, active

    add("sampling+compact", timeit(
        f_sampling, gbuf, state2.frame, iters=args.iters, name="sampling"))
    sal, mask, idx, active = jax.jit(f_sampling)(gbuf, state2.frame)

    # ---- shading on the compacted wavefront (SoA) -----------------------
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)
    seeds = rng.pixel_seed(idx, state2.frame)
    ndc_x = (px + 0.5) / w * 2.0 - 1.0
    ndc_y = (py + 0.5) / h * 2.0 - 1.0
    _, dirs = cam.unproject_v(ndc_x, ndc_y, float(w) / float(h))
    origins = vec.splat(cam.eye, dirs.shape)
    jax.block_until_ready((dirs.x, origins.x, seeds))

    # shade ray work: closest-hit + NEE shadow per bounce on the
    # (halving-compacted) wavefront — mirrors shade_v's rays_traced
    shade_rays = 0
    width_b = budget
    for b in range(config.max_depth):
        shade_rays += 2 * width_b
        if b + 1 < config.max_depth:
            width_b = max(1024, width_b // 2)

    add(f"shade_fwd_{budget//1024}k", timeit(
        lambda s, o, d, sd: shade_mod.shade_v(s, o, d, sd, config),
        scene, origins, dirs, seeds, iters=args.iters,
        name="shade_fwd"), shade_rays)

    # shade fwd+bwd (w.r.t. light emission + kd, like the bench loss)
    def shade_loss(emission, kd, o, d, sd):
        s2 = scene.replace(
            light=scene.light.replace(emission=emission),
            materials=scene.materials.replace(kd=kd))
        r, _ = shade_mod.shade_v(s2, o, d, sd, config)
        return vec.mean_reduce(r)

    add("shade_fwd+bwd", timeit(
        jax.grad(shade_loss, argnums=(0, 1)),
        scene.light.emission, scene.materials.kd,
        origins, dirs, seeds, iters=args.iters, name="shade_fwd+bwd"),
        shade_rays)

    # ---- reconstruction (planar, bench path) -----------------------------
    # realistic shading planes from the second frame's history
    cnt = state2.history[3]
    inv = jnp.where(cnt > 0.0, 1.0 / jnp.maximum(cnt, 1e-20), 0.0)
    sh_rgb = vec.Vec3(state2.history[0] * inv, state2.history[1] * inv,
                      state2.history[2] * inv)
    sh_a = (cnt > 0.0).astype(jnp.float32)
    position = gbuf["position"]
    normal = gbuf["normal"]
    jax.block_until_ready((sh_a, position.x, normal.x))

    add("pullpush", timeit(pullpush.pull_push_v, sh_rgb, sh_a,
                           iters=args.iters, name="pullpush"))
    pp_rgb, pp_a = jax.jit(pullpush.pull_push_v)(sh_rgb, sh_a)
    add("atrous", timeit(
        lambda c, p, n: atrous.atrous_denoise_v(
            c, p, n, config.atrous_iterations, config.atrous_c_phi,
            config.atrous_n_phi, config.atrous_p_phi),
        pp_rgb, position, normal, iters=args.iters, name="atrous"))

    sh_rows = jnp.concatenate([vec.to_rows(sh_rgb), sh_a[..., None]],
                              axis=-1)
    add("jfa", timeit(jfa.jump_flood, sh_rows, iters=args.iters,
                      name="jfa"))
    if not args.quick:
        from fovtrace.kernels import sibson
        coord, jcol = jax.jit(jfa.jump_flood)(sh_rows)
        add("sibson", timeit(
            lambda c, col: sibson.sibson_interpolate(
                c, col, config.sibson_max_radius),
            coord, jcol, iters=max(2, args.iters // 4), name="sibson"))

    # ---- full frame ------------------------------------------------------
    frame_rays = int(out2["rays_traced"])
    add("full_fwd", timeit(
        lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config),
        scene, cam, gaze, state2, iters=args.iters, name="full_fwd"),
        frame_rays)

    # bench-identical loss: light + materials + CAMERA POSE grads
    def loss_fn(emission, kd, eye, target, st):
        s2 = scene.replace(
            light=scene.light.replace(emission=emission),
            materials=scene.materials.replace(kd=kd))
        c2 = cam.replace(eye=eye, target=target)
        o, _ = pipeline.render_frame(s2, c2, gaze, st, config)
        return vec.mean_reduce(o["image_rgb"])

    add("full_fwd+bwd", timeit(
        jax.grad(loss_fn, argnums=(0, 1, 2, 3)),
        scene.light.emission, scene.materials.kd, cam.eye, cam.target,
        state2, iters=args.iters, name="full_fwd+bwd"), frame_rays)

    # ---- report -----------------------------------------------------------
    stage_names = ("gbuffer_total", "sampling+compact", "pullpush",
                   "atrous")
    stage_sum = sum(ms for n, ms, _, _ in rows if n in stage_names)
    stage_sum += sum(ms for n, ms, _, _ in rows if n.startswith("shade_fwd_"))
    full = [ms for n, ms, _, _ in rows if n == "full_fwd"]
    consistency = (f"stage sum (gbuffer+sampling+shade_fwd+pullpush+atrous)"
                   f" = {stage_sum:.1f} ms vs full_fwd = {full[0]:.1f} ms"
                   if full else "")

    lines = ["# Stage profile (TPU)", "",
             f"scene={args.scene} tris={scene.num_triangles} {w}x{h} "
             f"budget={budget} device={jax.devices()[0]}", "",
             "Method: each stage jitted to ONE scalar depending on every "
             "output leaf (no DCE, single readback); two iteration counts "
             "cross-checked (unstable rows marked). Remote-tunnel dispatch "
             "latency is ~9 ms/call — sub-ms rows are dispatch-bound.", "",
             "| stage | ms | Mrays/s | note |", "|---|---|---|---|"]
    for name, ms, stable, rays in rows:
        mrays = f"{rays / ms / 1e3:.1f}" if rays else ""
        note = "" if stable else "UNSTABLE"
        lines.append(f"| {name} | {ms:.2f} | {mrays} | {note} |")
    lines += ["", consistency, ""]
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_STAGES.md"), "w") as f:
        f.write(report)


if __name__ == "__main__":
    main()
