"""Per-stage TPU timing of the bench frame (VERDICT round-2 task #1).

Times each pipeline stage as a separately-jitted function on realistic
intermediate data (taken from one real forward pass), mirroring the
reference's per-stage CSV report (`REF/main.cpp:260-374`: GB, Sampling,
Optimize, Shading, JFA, SI, PPI, AT, Total).

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
import os as _os
if _os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _block(out):
    # block on the explicit leaf list: block_until_ready on some struct
    # pytrees returned bogus ~0ms timings on the axon remote TPU
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return out


def timeit(fn, *args, iters=8, warmup=2, name=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _block(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        _block(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[profile] {name:24s} {ms:9.2f} ms   (compile {compile_s:.1f}s)",
          file=sys.stderr, flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--scene", default="earth")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from fovtrace import Camera, RenderConfig
    from fovtrace.kernels import atrous, jfa, pullpush, saliency, sampling
    from fovtrace.render import gbuffer as gbuffer_mod
    from fovtrace.render import pipeline
    from fovtrace.render import shade as shade_mod
    from fovtrace.core import rng, reproject
    from fovtrace.core import color as colorx
    from fovtrace.kernels import intersect as isect
    from fovtrace.scene import procedural

    config = RenderConfig(
        width=args.width, height=args.height, reconstruction="atrous",
        max_depth=4, diffuse_max_depth=1, ray_budget_frac=0.30,
    )
    w, h = config.width, config.height
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))
    print(f"[profile] scene={args.scene} tris={scene.num_triangles} "
          f"{w}x{h} budget={config.ray_budget} device={jax.devices()[0]}",
          file=sys.stderr, flush=True)

    rows = []

    # ---- materialize realistic intermediates from one forward pass -----
    fwd = jax.jit(lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config))
    out, state1 = fwd(scene, cam, gaze, state)
    jax.block_until_ready(out["image"])
    # second frame state: history populated -> realistic temporal path
    out2, state2 = fwd(scene, cam, gaze, state1)
    jax.block_until_ready(out2["image"])

    gbuf = jax.jit(
        lambda s, c, pc: gbuffer_mod.trace_gbuffer(s, c, pc, w, h, config)
    )(scene, cam, state2.prev_camera)
    jax.block_until_ready(gbuf)

    # primary rays for isolated intersect/occlusion timing (SoA)
    from fovtrace.core import vec
    rov, rdv = cam.primary_rays_v(w, h)
    ro_f = rov.map(lambda a: a.reshape(-1))
    rd_f = rdv.map(lambda a: a.reshape(-1))

    # ---- isolated kernels ----------------------------------------------
    f_isect = jax.jit(lambda s, o, d: isect.intersect_v(
        s, o, d, config.scene_epsilon, isect.BIG_T))
    rows.append(("gb_intersect_2.1Mray", timeit(
        f_isect, scene, ro_f, rd_f, iters=args.iters, name="gb_intersect")))

    f_occl = jax.jit(lambda s, o, d: isect.occlusion_v(
        s, o, d, config.scene_epsilon, isect.BIG_T))
    rows.append(("gb_occlusion_2.1Mray", timeit(
        f_occl, scene, ro_f, rd_f, iters=args.iters, name="gb_occlusion")))

    f_gb = jax.jit(lambda s, c, pc: gbuffer_mod.trace_gbuffer(
        s, c, pc, w, h, config))
    rows.append(("gbuffer_total", timeit(
        f_gb, scene, cam, state2.prev_camera, iters=args.iters, name="gbuffer")))

    # ---- sampling: saliency + mask + compaction -------------------------
    bbox_diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)

    def f_sampling(gbuf_, frame):
        sal = saliency.compute_saliency(gbuf_, gaze, bbox_diag,
                                        config.saliency_block)
        gdist = sampling.gaze_distance(h, w, gaze)
        mask = sampling.masked_sampling(
            h, w, gdist, sal, config.aperture, config.extra_sample_rate)
        idx, active = sampling.compact_rays(mask, config.ray_budget)
        return sal, mask, idx, active

    f_sampling_j = jax.jit(f_sampling)
    rows.append(("sampling+compact", timeit(
        f_sampling_j, gbuf, state2.frame, iters=args.iters, name="sampling")))
    sal, mask, idx, active = f_sampling_j(gbuf, state2.frame)

    # ---- shading on the compacted wavefront (SoA) -------------------------
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)
    seeds = rng.pixel_seed(idx, state2.frame)
    ndc_x = (px + 0.5) / w * 2.0 - 1.0
    ndc_y = (py + 0.5) / h * 2.0 - 1.0
    _, dirs = cam.unproject_v(ndc_x, ndc_y, float(w) / float(h))
    origins = vec.splat(cam.eye, dirs.shape)
    jax.block_until_ready((dirs, origins, seeds))

    f_shade = jax.jit(lambda s, o, d, sd: shade_mod.shade_v(s, o, d, sd,
                                                            config))
    rows.append((f"shade_fwd_{config.ray_budget//1024}k", timeit(
        f_shade, scene, origins, dirs, seeds, iters=args.iters, name="shade_fwd")))

    # shade backward (w.r.t. light emission + kd, like bench loss)
    def shade_loss(emission, kd, o, d, sd):
        s2 = scene.replace(
            light=scene.light.replace(emission=emission),
            materials=scene.materials.replace(kd=kd))
        r, _ = shade_mod.shade_v(s2, o, d, sd, config)
        return vec.mean_reduce(r)

    f_shade_bwd = jax.jit(jax.grad(shade_loss, argnums=(0, 1)))
    rows.append(("shade_fwd+bwd", timeit(
        f_shade_bwd, scene.light.emission, scene.materials.kd,
        origins, dirs, seeds, iters=args.iters, name="shade_fwd+bwd")))

    # ---- reconstruction (planar) ------------------------------------------
    shading = out2["shading"]
    sh_rgb = vec.from_rows(shading[..., :3])
    sh_a = shading[..., 3]
    position = gbuf["position"]
    normal = gbuf["normal"]
    jax.block_until_ready((shading, position, normal))

    f_jfa = jax.jit(jfa.jump_flood)
    rows.append(("jfa", timeit(f_jfa, shading, iters=args.iters, name="jfa")))

    f_pp = jax.jit(pullpush.pull_push_v)
    rows.append(("pullpush", timeit(f_pp, sh_rgb, sh_a, iters=args.iters,
                                    name="pullpush")))

    pp_rgb, pp_a = f_pp(sh_rgb, sh_a)
    f_at = jax.jit(lambda c, p, n: atrous.atrous_denoise_v(
        c, p, n, config.atrous_iterations, config.atrous_c_phi,
        config.atrous_n_phi, config.atrous_p_phi))
    rows.append(("atrous", timeit(f_at, pp_rgb, position, normal,
                                  iters=args.iters, name="atrous")))

    try:
        from fovtrace.kernels import sibson
        f_si = jax.jit(lambda c, col: sibson.sibson_interpolate(
            c, col, config.sibson_max_radius))
        coord, jcol = f_jfa(shading)
        rows.append(("sibson", timeit(f_si, coord, jcol, iters=2,
                                      name="sibson")))
    except Exception as e:  # pragma: no cover
        print(f"[profile] sibson skipped: {e}", file=sys.stderr)

    # ---- full frame -------------------------------------------------------
    rows.append(("full_fwd", timeit(
        fwd, scene, cam, gaze, state2, iters=args.iters, name="full_fwd")))

    # bench-identical loss: light + materials + CAMERA POSE grads,
    # minimal outputs (full_outputs=False)
    cfg_min = config.replace(full_outputs=False)

    def loss_fn(emission, kd, eye, target, st):
        s2 = scene.replace(
            light=scene.light.replace(emission=emission),
            materials=scene.materials.replace(kd=kd))
        c2 = cam.replace(eye=eye, target=target)
        o, _ = pipeline.render_frame(s2, c2, gaze, st, cfg_min)
        return vec.mean_reduce(o["image_rgb"])

    fwdbwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
    rows.append(("full_fwd+bwd", timeit(
        fwdbwd, scene.light.emission, scene.materials.kd, cam.eye,
        cam.target, state2, iters=args.iters, name="full_fwd+bwd")))

    # ---- report -----------------------------------------------------------
    lines = ["# Stage profile (TPU)", "",
             f"scene={args.scene} tris={scene.num_triangles} {w}x{h} "
             f"budget={config.ray_budget} device={jax.devices()[0]}", "",
             "| stage | ms |", "|---|---|"]
    for name, ms in rows:
        lines.append(f"| {name} | {ms:.2f} |")
    report = "\n".join(lines) + "\n"
    print(report)
    with open("PROFILE_STAGES.md", "w") as f:
        f.write(report)


if __name__ == "__main__":
    main()
