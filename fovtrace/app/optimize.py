"""Differentiable-rendering optimization CLI (BASELINE config 5 demo).

Recovers camera pose / light power / material albedo from a target image
by gradient descent through the renderer, sharded over all local devices
(row-block data parallelism, psum'd grads), with checkpoint/resume.

Run:  python -m fovtrace.app.optimize --scene box --steps 60 \
          --ckpt /tmp/fovopt --perturb 0.3
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="fovtrace inverse rendering")
    p.add_argument("--scene", default="box")
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=2e-2)
    p.add_argument("--perturb", type=float, default=0.3,
                   help="initial camera-eye offset magnitude")
    p.add_argument("--ckpt", default=None, help="checkpoint directory")
    p.add_argument("--ckpt-every", type=int, default=20)
    p.add_argument("--max-depth", type=int, default=2)
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size (default: all local devices)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from fovtrace import Camera, RenderConfig
    from fovtrace.dist import checkpoint as ckpt
    from fovtrace.dist import sharding as shd
    from fovtrace.dist import train
    from fovtrace.scene import procedural

    mesh = shd.make_mesh(args.devices)
    n_dev = mesh.devices.size
    h = args.height - args.height % n_dev  # divisible rows
    config = RenderConfig(width=args.width, height=h,
                          max_depth=args.max_depth, diffuse_max_depth=1,
                          reconstruction="none")
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.6, 0.0))

    print(f"[optimize] scene={args.scene} {args.width}x{h} "
          f"devices={n_dev} steps={args.steps}", file=sys.stderr)

    # ground-truth render with the TRUE parameters = the target
    true_params = train.init_params(scene, cam)
    step_fn, optimizer = train.make_train_step(scene, cam, config, mesh,
                                               optax.adam(args.lr))

    target = _render_target(scene, cam, true_params, config, mesh)
    target = jax.device_put(target, shd.row_sharding(mesh))

    # perturbed start
    rngs = np.random.default_rng(0)
    delta = rngs.normal(size=3).astype(np.float32)
    delta = delta / np.linalg.norm(delta) * args.perturb
    params = true_params._replace(
        eye=true_params.eye + jnp.asarray(delta),
        light_emission=true_params.light_emission * 1.5,
    )
    opt_state = optimizer.init(params)

    start_step = 0
    if args.ckpt:
        start_step, (params, opt_state) = ckpt.restore_or_init(
            args.ckpt, (params, opt_state))
        if start_step:
            print(f"[optimize] resumed from step {start_step}",
                  file=sys.stderr)

    t0 = time.perf_counter()
    loss = None
    for step in range(start_step, args.steps):
        params, opt_state, loss = step_fn(params, opt_state, target,
                                          jnp.asarray(step, jnp.int32))
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            err = float(jnp.linalg.norm(params.eye - true_params.eye))
            print(f"[optimize] step {step}: loss={float(loss):.6f} "
                  f"eye_err={err:.4f}", file=sys.stderr)
        if args.ckpt and (step + 1) % args.ckpt_every == 0:
            ckpt.save(args.ckpt, step + 1, (params, opt_state))
    if args.ckpt:
        ckpt.save(args.ckpt, args.steps, (params, opt_state))

    err = float(jnp.linalg.norm(params.eye - true_params.eye))
    wall = time.perf_counter() - t0
    loss_s = f"{float(loss):.6f}" if loss is not None else "n/a (resumed past end)"
    print(f"[optimize] done in {wall:.1f}s | final loss {loss_s} "
          f"| eye error {err:.4f} (start {args.perturb:.3f})",
          file=sys.stderr)
    return 0 if err < args.perturb else 1


def _render_target(scene, cam, params, config, mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    import functools

    from fovtrace.dist import sharding as shd
    from fovtrace.dist import train

    block_h = config.height // mesh.devices.size

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P(),),
                       out_specs=P(shd.AXIS),
                       check_vma=False)
    def render(p):
        tile = jax.lax.axis_index(shd.AXIS)
        sc, c = train._apply_params(scene, cam, p)
        return train.render_rows_dense(sc, c, p, tile * block_h, block_h,
                                       config, jnp.asarray(0, jnp.int32))

    return jax.lax.stop_gradient(render(params))


if __name__ == "__main__":
    raise SystemExit(main())
