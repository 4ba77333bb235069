"""Bisect the 280s forward compile: time AOT lower+compile per stage."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"[compile] {name:34s} lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          file=sys.stderr, flush=True)


def main():
    from fovtrace import Camera, RenderConfig
    from fovtrace.core import rng, vec
    from fovtrace.kernels import intersect as isect
    from fovtrace.render import pipeline, shade as shade_mod
    from fovtrace.scene import procedural

    config = RenderConfig(width=1920, height=1088, reconstruction="atrous",
                          max_depth=4, diffuse_max_depth=1,
                          ray_budget_frac=0.30, full_outputs=False)
    scene = procedural.SCENES["earth"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(544), jnp.asarray(960))
    w, h = config.width, config.height

    # stage 1: gbuffer (closest 2.1M + occlusion 2.1M, chunked)
    probe("gbuffer", lambda s, c, pc: pipeline.stage_gbuffer(s, c, pc, config),
          scene, cam, state.prev_camera)

    # shade_v at budget width (4 bounce shapes x closest+occl)
    n = config.ray_budget
    idx = jnp.arange(n, dtype=jnp.int32)
    seeds = rng.pixel_seed(idx, jnp.asarray(0))
    px = (idx % w).astype(jnp.float32)
    py = (idx // w).astype(jnp.float32)
    _, dirs = cam.unproject_v(px / w * 2 - 1, py / h * 2 - 1, w / h)
    origins = vec.splat(cam.eye, dirs.shape)
    probe("shade_v(budget)",
          lambda s, o, d, sd: shade_mod.shade_v(s, o, d, sd, config),
          scene, origins, dirs, seeds)

    # single pallas closest at one bounce width
    probe("isect 612k",
          lambda o, d: isect.intersect_v(scene, o, d, 1e-3, isect.BIG_T),
          origins, dirs)
    probe("occl 612k",
          lambda o, d: isect.occlusion_v(scene, o, d, 1e-3, isect.BIG_T),
          origins, dirs)

    # full frame for reference
    probe("full_fwd",
          lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config),
          scene, cam, gaze, state)


if __name__ == "__main__":
    main()
