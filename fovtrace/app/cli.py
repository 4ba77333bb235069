"""Headless renderer CLI — the TPU-native `main()`.

Replaces the reference's interactive GLFW loop (`REF/main.cpp:115-461`):
  - resolution argv               -> --width/--height (same 1024x1024 default)
  - mouse-cursor gaze             -> --gaze trajectory (fixed/circle/lissajous/CSV)
  - keys 1-9 texture switchboard  -> --view {image,depth,albedo,weight,jfa,
                                     sibson,atrous,pullpush,shading,saliency,mask}
                                     (main.cpp:396-409, gui.cpp:122-131)
  - PgUp/PgDn aperture, arrows light power, keypad GI depth (gui.cpp:141-182)
                                  -> --aperture/--light-power/--gi-depth flags
  - Space optimize toggle         -> --no-optimize (dense full-res sampling)
  - HOME BMP capture              -> --save-every/--out (saveBMP24 gui.cpp:315)
  - per-frame CSV report          -> --report (PrintMSTimes main.cpp:21-24)

Run:  python -m fovtrace.app.cli --scene earth --frames 16 --out /tmp/frames
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fovtrace: foveated path tracer")
    p.add_argument("--scene", default="earth",
                   help="procedural scene name or path to .obj")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--gaze", default="circle",
                   help="fixed | circle | lissajous | path/to/trajectory.csv")
    p.add_argument("--view", default="image",
                   choices=["image", "depth", "albedo", "weight", "jfa",
                            "sibson", "atrous", "pullpush", "shading",
                            "saliency", "mask"],
                   help="which buffer to dump (keys 1-9 equivalent)")
    p.add_argument("--reconstruction", default="atrous",
                   choices=["jfa", "sibson", "pullpush", "atrous", "all", "none"])
    p.add_argument("--sampling", default="masked",
                   choices=["masked", "weier", "author", "logpolar", "full"])
    p.add_argument("--aperture", type=float, default=0.07)
    p.add_argument("--dof", action="store_true",
                   help="thin-lens depth of field with gaze autofocus "
                        "(createPinHoleCam + main.cpp:278-287)")
    p.add_argument("--lens-radius", type=float, default=0.05,
                   help="thin-lens disc radius, world units")
    p.add_argument("--light-power", type=float, default=810.0)
    p.add_argument("--gi-depth", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--ray-budget-frac", type=float, default=0.35)
    p.add_argument("--no-optimize", action="store_true",
                   help="disable foveation (trace every pixel, g_isOptimize=false)")
    p.add_argument("--no-temporal", action="store_true")
    p.add_argument("--eye", type=float, nargs=3, default=(3.0, 2.5, 4.0))
    p.add_argument("--target", type=float, nargs=3, default=(0.0, 0.8, 0.0))
    p.add_argument("--out", default=None, help="directory for frame dumps")
    p.add_argument("--save-every", type=int, default=0,
                   help="dump every Nth frame (0 = last frame only)")
    p.add_argument("--format", default="bmp", choices=["bmp", "ppm", "npy"])
    p.add_argument("--report", default=None, help="per-frame CSV report path")
    p.add_argument("--profile-stages", action="store_true",
                   help="time each pipeline stage separately (diagnostic)")
    p.add_argument("--jax-trace", default=None,
                   help="directory for a jax.profiler trace")
    p.add_argument("--sharded", action="store_true",
                   help="shard screen tiles over all local devices")
    p.add_argument("--seed-frame", type=int, default=0)
    return p


def load_scene(name: str):
    from fovtrace.scene import procedural

    if name in procedural.SCENES:
        return procedural.SCENES[name]()
    if name == "reference" or os.path.isdir(name):
        # the reference's shipped assets (CedarCity.hdr, grid.ppm,
        # bunny.{mtl,PPM}, vokselia_spawn.{mtl,png})
        from fovtrace.scene import assets

        return assets.reference_assets_scene(
            "/root/reference/resource" if name == "reference" else name)
    if os.path.exists(name) and name.endswith(".obj"):
        # full OBJ+MTL pipeline: per-face materials + map_Kd textures
        # (reference load_obj, PathTracer.cpp:676-772)
        from fovtrace.scene import assets

        return assets.scene_from_obj(name)
    if os.path.exists(name) and name.endswith(".json"):
        # multi-model scene spec (reference init_geometry's 5-model
        # composition, PathTracer.cpp:582-595)
        from fovtrace.scene import assets

        return assets.scene_from_spec(name)
    raise SystemExit(
        f"unknown scene {name!r}; procedural: {sorted(procedural.SCENES)}, "
        f"or a path to .obj / scene-spec .json"
    )


def to_u8_image(view: str, out: dict) -> np.ndarray:
    """Convert a selected output buffer to an HxWx3 uint8 image, matching
    the reference's display conversions (nFS.glsl blit + heatmaps)."""
    import jax.numpy as jnp

    key = {"depth": "depth", "albedo": "albedo", "weight": "weight",
           "saliency": "saliency_view", "mask": "mask",
           "shading": "shading"}.get(view, view)
    if key not in out:
        key = "image"
    buf = np.asarray(out[key], np.float32)
    if buf.ndim == 2:  # depth / saliency / mask scalars
        mx = buf.max()
        buf = buf / mx if mx > 0 else buf
        buf = np.stack([buf] * 3, axis=-1)
    buf = buf[..., :3]
    return (np.clip(buf, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_frame(path_base: str, fmt: str, img_u8: np.ndarray) -> str:
    from fovtrace.scene import image_io

    if fmt == "bmp":
        image_io.save_bmp(path_base + ".bmp", img_u8)
        return path_base + ".bmp"
    if fmt == "ppm":
        image_io.save_ppm(path_base + ".ppm", img_u8)
        return path_base + ".ppm"
    np.save(path_base + ".npy", img_u8)
    return path_base + ".npy"


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fovtrace import Camera, RenderConfig
    from fovtrace.app import profiler as prof_mod
    from fovtrace.app import trajectory
    from fovtrace.render import pipeline

    config = RenderConfig(
        width=args.width, height=args.height,
        aperture=args.aperture,
        sampling_mode="full" if args.no_optimize else args.sampling,
        diffuse_max_depth=args.gi_depth,
        max_depth=args.max_depth,
        ray_budget_frac=1.0 if args.no_optimize else args.ray_budget_frac,
        temporal=not args.no_temporal,
        reconstruction=args.reconstruction,
        dof=args.dof,
        lens_radius=args.lens_radius,
    )
    scene = load_scene(args.scene)
    if args.light_power != 810.0:
        from fovtrace.scene.scene import ParallelogramLight

        scene = scene.replace(light=ParallelogramLight.default(args.light_power))

    cam = Camera.create(eye=tuple(args.eye), target=tuple(args.target))
    gazes, poses = trajectory.make(args.gaze, args.height, args.width,
                                   args.frames)

    state = pipeline.FrameState.initial(cam, config)
    timer = prof_mod.StageTimer()
    if args.out:
        os.makedirs(args.out, exist_ok=True)

    print(f"[fovtrace] scene={args.scene} tris={scene.num_triangles} "
          f"{args.width}x{args.height} frames={args.frames} "
          f"sampling={config.sampling_mode} recon={config.reconstruction} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    if args.sharded:
        from fovtrace.dist import sharding as shd

        mesh = shd.make_mesh()
        state = shd.initial_state_sharded(cam, config, mesh)
        render = jax.jit(lambda s, c, g, st: shd.render_sharded(
            s, c, g, st, config, mesh))
    else:
        render = None  # use pipeline.render_frame_jit

    trace_ctx = None
    if args.jax_trace:
        trace_ctx = jax.profiler.trace(args.jax_trace)
        trace_ctx.__enter__()

    total_rays = 0
    t_all0 = time.perf_counter()
    out = None
    for f, gaze in enumerate(gazes):
        if poses is not None:
            eye, tgt = poses[f]
            cam = cam.replace(eye=jnp.asarray(eye), target=jnp.asarray(tgt))
        g = (jnp.asarray(gaze[0]), jnp.asarray(gaze[1]))

        t0 = time.perf_counter()
        if args.sharded:
            out, new_state = render(scene, cam, jnp.asarray(gaze), state)
            jax.block_until_ready(out["image"])
        elif args.profile_stages:
            # per-stage timing columns (GB, Sampling, Optimize, Shading,
            # JFA, SI, PPI, AT) in the CSV — reference report format
            # (REF/main.cpp:260-374)
            from fovtrace.render import staged

            out, new_state = staged.render_frame_staged(
                scene, cam, g, state, config, timer)
            jax.block_until_ready(out["image"])
        else:
            out, new_state = pipeline.render_frame_jit(scene, cam, g, state,
                                                       config)
            jax.block_until_ready(out["image"])
        frame_ms = (time.perf_counter() - t0) * 1e3
        rays = int(out["ray_count"])
        total_rays += rays
        timer.add("frame_ms", frame_ms)
        timer.end_frame(extra={
            "frame": float(f),
            "Total": frame_ms,
            "fps": 1000.0 / max(frame_ms, 1e-6),
            "aperture": args.aperture,
            "ray_count": float(rays),
            "ray_pct": 100.0 * rays / (args.width * args.height),
        })
        state = new_state

        is_warmup = f == 0
        if not is_warmup and f % max(1, args.frames // 8) == 0:
            print(f"[fovtrace] frame {f}: {frame_ms:.1f} ms "
                  f"({rays} rays, {100.0*rays/(args.width*args.height):.1f}%)",
                  file=sys.stderr)
        if args.out and args.save_every and f % args.save_every == 0:
            p = save_frame(os.path.join(args.out, f"frame_{f:04d}_a"
                                        f"{args.aperture:.3f}"),
                           args.format, to_u8_image(args.view, out))

    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)

    wall = time.perf_counter() - t_all0
    # steady-state FPS excludes the first (compile) frame
    steady = [r["frame_ms"] for r in timer.frame_rows[1:]] or [
        timer.frame_rows[0]["frame_ms"]]
    mean_ms = float(np.mean(steady))
    print(f"[fovtrace] {args.frames} frames in {wall:.2f}s | steady "
          f"{mean_ms:.2f} ms/frame ({1000.0/mean_ms:.1f} FPS) | "
          f"mean rays/frame {total_rays/max(1,args.frames):.0f}",
          file=sys.stderr)

    if args.out and out is not None:
        p = save_frame(os.path.join(
            args.out, f"frame_final_a{args.aperture:.3f}"),
            args.format, to_u8_image(args.view, out))
        print(f"[fovtrace] wrote {p}", file=sys.stderr)
    if args.report:
        timer.write_csv(args.report)
        print(f"[fovtrace] report -> {args.report}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
