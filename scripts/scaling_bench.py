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
    p.add_argument("--proj-width", type=int, default=1920)
    p.add_argument("--proj-height", type=int, default=1088)
    p.add_argument("--tpu-frame-ms", type=float, default=373.3,
                   help="measured single-chip TPU bench frame (fwd+bwd) "
                        "for the analytic projection")
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

    # ---- analytic collective accounting (exact bytes from the shapes;
    # the wall-clock table above is meaningless for efficiency on the
    # virtual CPU mesh where 8 "devices" share 2 cores). Projected at
    # the BENCH resolution, where the single-chip frame time is
    # measured. --------------------------------------------------------
    H, W = args.proj_height, args.proj_width
    lines2 = []
    per_dev_ms_tpu = args.tpu_frame_ms  # measured single-chip bench
    for n, *_ in rows:
        if n == 1:
            continue
        f = (n - 1) / n
        ag_hist = 16 * H * W * f           # [4,H,W] f32 all_gather (recv B/dev)
        ag_depth = 4 * H * W * f           # [H,W] f32
        halo_sal = 2 * 8 * W * 6 * 4       # 8-row halo x 6 planes, up+down
        # pull-push: 2-row halo x 4 planes per pyramid level (width
        # halves per level); atrous: 3 iterations x 16-row halo (step
        # doubling) x 3 planes, up+down
        pp_halo = sum(2 * 2 * max(W >> l, 1) * 4 * 4 for l in range(9))
        at_halo = 3 * 2 * 16 * W * 3 * 4
        total = ag_hist + ag_depth + halo_sal + pp_halo + at_halo
        ici_ms = total / 45e9 * 1e3        # v5e ~45 GB/s per ICI direction
        comp_ms = per_dev_ms_tpu / n
        proj_eff = comp_ms / (comp_ms + ici_ms) * 100.0
        lines2.append((n, total / 1e6, ici_ms, comp_ms, proj_eff))

    lines = ["# Scaling (sharded renderer)", "",
             f"scene={args.scene} {args.width}x{args.height} "
             f"device={devs[0].platform} x{len(devs)} "
             f"hosts={jax.process_count()}", "",
             "## Wall clock (this mesh)", "",
             "| devices | ms/frame | Mrays/s | efficiency |",
             "|---|---|---|---|"]
    for n, ms, rate, eff, _ in rows:
        lines.append(f"| {n} | {ms:.1f} | {rate:.2f} | {eff:.0f}% |")
    if devs[0].platform == "cpu":
        lines += ["",
                  "NOTE: on the 8-virtual-device CPU mesh all shards share "
                  "2 physical cores, so wall-clock 'efficiency' measures "
                  "core contention, not the sharded design. The table "
                  "validates structure (collectives compile + execute, "
                  "per-tile budgets balance); the projection below costs "
                  "the collectives analytically."]
    lines += ["", "## Projected TPU v5e efficiency (analytic)", "",
              "Per-frame collective bytes per device from the actual "
              f"shapes at BENCH resolution ({W}x{H}) — history+depth "
              "all_gather for reverse reprojection, saliency/pull-push/"
              "atrous ppermute halos — costed at ~45 GB/s/direction ICI; "
              "compute = measured single-chip bench frame "
              f"({per_dev_ms_tpu:.0f} ms) / N.", "",
              "| devices | MB/frame/dev | ICI ms | compute ms | projected eff |",
              "|---|---|---|---|---|"]
    for n, mb, ici_ms, comp_ms, eff in lines2:
        lines.append(f"| {n} | {mb:.1f} | {ici_ms:.2f} | {comp_ms:.1f} "
                     f"| {eff:.0f}% |")
    lines += ["",
              "The dominant term is the temporal-cache all_gather "
              "(reverse reprojection reads arbitrary prev-frame pixels); "
              "it is O(H*W) per device regardless of N, so efficiency "
              "decays only through the shrinking compute share. Real "
              "multi-host runs use fovtrace.dist.launch.init_distributed "
              "(jax.distributed) — unavailable in this 1-host dev "
              "environment, so the N>=2-host row is the projection "
              "above."]
    report = "\n".join(lines) + "\n"
    print(report)
    if launch.is_coordinator():
        with open(args.out, "w") as f:
            f.write(report)


if __name__ == "__main__":
    main()
