"""Aperture sweep: ray-% and throughput vs foveal radius.

The reference's commented-out sweep automation (`main.cpp:304-323`
steps g_apertureSize 0.03..0.14 while the CSV logger records per-stage
times + ray count). Each aperture is a static config (fresh XLA
compile); forward-only frames on the bench scene.

Usage: python scripts/aperture_sweep.py [--width 1920 --height 1088]
Writes SWEEP.csv at the repo root: aperture, ray_pct, frame_ms, mrays_s.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--scene", default="earth")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--apertures", type=float, nargs="*",
                    default=[0.03, 0.05, 0.07, 0.09, 0.11, 0.14])
    args = ap.parse_args()

    from fovtrace import Camera, RenderConfig
    from fovtrace.render import pipeline
    from fovtrace.scene import procedural

    h, w = args.height, args.width
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))

    rows = ["aperture,ray_pct,frame_ms,mrays_s"]
    for a in args.apertures:
        config = RenderConfig(width=w, height=h, reconstruction="atrous",
                              max_depth=4, diffuse_max_depth=1,
                              aperture=a, ray_budget_frac=0.75,
                              full_outputs=False)
        state = pipeline.FrameState.initial(cam, config)
        fwd = jax.jit(lambda s, c, g, st: pipeline.render_frame(
            s, c, g, st, config))
        out, state = fwd(scene, cam, gaze, state)
        assert int(out["rays_dropped"]) == 0, "raise ray_budget_frac"
        rays = int(out["rays_traced"])
        ray_pct = 100.0 * float(out["ray_count"]) / (h * w)
        out, state = fwd(scene, cam, gaze, state)          # warm
        jax.block_until_ready(out["image_rgb"])
        t0 = time.time()
        for _ in range(args.iters):
            out, _ = fwd(scene, cam, gaze, state)
        jax.block_until_ready(out["image_rgb"])
        ms = (time.time() - t0) / args.iters * 1e3
        rows.append(f"{a},{ray_pct:.2f},{ms:.2f},{rays/ms/1e3:.2f}")
        print(f"[sweep] a={a} rays {ray_pct:.1f}% {ms:.1f} ms "
              f"{rays/ms/1e3:.1f} Mrays/s", file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SWEEP.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print("[sweep] wrote SWEEP.csv", file=sys.stderr)


if __name__ == "__main__":
    main()
