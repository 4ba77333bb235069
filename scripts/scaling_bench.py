"""Scaling-efficiency harness: sharded frame throughput at 1/2/4/8
devices (BASELINE.md north star: >=85% on 2+ hosts; the per-frame
counterpart of the reference's CSV report, REF/main.cpp:288-299).

Runs on whatever devices exist: a real TPU slice, or the 8-virtual-CPU
mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
to validate the harness + collective structure without a pod. Writes
SCALING.md.

Usage: python scripts/scaling_bench.py [--width 1920 --height 1088]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--scene", default="earth")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--out", default="SCALING.md")
    args = p.parse_args()

    from fovtrace import Camera, RenderConfig
    from fovtrace.dist import launch, sharding as shd
    from fovtrace.scene import procedural

    launch.init_distributed()
    devs = jax.devices()
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    rows = []
    base_rate = None
    for n in sizes:
        if args.height % n or (args.height // n) % 8:
            print(f"[scaling] skip n={n}: height alignment", file=sys.stderr)
            continue
        config = RenderConfig(
            width=args.width, height=args.height, reconstruction="atrous",
            max_depth=4, diffuse_max_depth=1, ray_budget_frac=0.30,
        )
        mesh = shd.make_mesh(n)
        state = shd.initial_state_sharded(cam, config, mesh)
        gaze = jnp.asarray([args.height // 2, args.width // 2])
        render = jax.jit(lambda s, c, g, st, _m=mesh, _c=config:
                         shd.render_sharded(s, c, g, st, _c, _m))
        t0 = time.time()
        out, state = render(scene, cam, gaze, state)
        jax.block_until_ready(out["image"])
        compile_s = time.time() - t0
        for _ in range(2):
            out, state = render(scene, cam, gaze, state)
        jax.block_until_ready(out["image"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, state = render(scene, cam, gaze, state)
        jax.block_until_ready(out["image"])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        rays = int(out["rays_traced"])
        rate = rays / (ms / 1e3) / 1e6
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n) * 100.0
        rows.append((n, ms, rate, eff, compile_s))
        print(f"[scaling] n={n}: {ms:.1f} ms/frame, {rate:.2f} Mrays/s, "
              f"eff {eff:.0f}% (compile {compile_s:.0f}s)", file=sys.stderr)

    lines = ["# Scaling (sharded renderer)", "",
             f"scene={args.scene} {args.width}x{args.height} "
             f"device={devs[0].platform} x{len(devs)} "
             f"hosts={jax.process_count()}", "",
             "| devices | ms/frame | Mrays/s | efficiency |", "|---|---|---|---|"]
    for n, ms, rate, eff, _ in rows:
        lines.append(f"| {n} | {ms:.1f} | {rate:.2f} | {eff:.0f}% |")
    report = "\n".join(lines) + "\n"
    print(report)
    if launch.is_coordinator():
        with open(args.out, "w") as f:
            f.write(report)


if __name__ == "__main__":
    main()
