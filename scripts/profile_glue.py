"""Profile the inter-stage glue that profile_stages.py's stage rows skip:
compaction, the temporal accumulate, and the cache fetch — the gap
between sum(stages) and full_fwd."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _scalarize(fn):
    def wrapped(*args):
        out = fn(*args)
        tot = jnp.float32(0.0)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "dtype"):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot
    return wrapped


def timeit(fn, *args, iters=16, name=""):
    f = jax.jit(_scalarize(fn))
    f(*args).block_until_ready()
    f(*args).block_until_ready()

    def run(k):
        t0 = time.perf_counter()
        s = None
        for _ in range(k):
            s = f(*args)
        s.block_until_ready()
        return (time.perf_counter() - t0) / k * 1e3

    a, b = run(max(2, iters // 4)), run(iters)
    tag = "stable" if abs(a - b) <= 0.2 * max(a, b) else f"UNSTABLE {a:.2f}"
    print(f"[glue] {name:32s} {b:9.2f} ms ({tag})", flush=True)


def main():
    from fovtrace import Camera, RenderConfig
    from fovtrace.core import reproject, rng, vec
    from fovtrace.render import pipeline
    from fovtrace.scene import procedural

    config = RenderConfig(width=1920, height=1088, reconstruction="atrous",
                          max_depth=4, diffuse_max_depth=1,
                          ray_budget_frac=0.30, full_outputs=False)
    w, h = config.width, config.height
    scene = procedural.SCENES["earth"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))

    fwd = jax.jit(lambda st: pipeline.render_frame(scene, cam, gaze, st,
                                                   config))
    out, st1 = fwd(state)
    out, st2 = fwd(st1)
    jax.block_until_ready(out)

    gbuf = pipeline.stage_gbuffer(scene, cam, st2.prev_camera, config)
    mask, sal, is_valid, fetched, gtgt, rcnt = pipeline.stage_sampling(
        scene, gbuf, gaze, st2, config)
    idx, active, rank, gate = pipeline.stage_compact(mask, config)
    jax.block_until_ready((jax.tree.leaves(gbuf), mask, is_valid, fetched,
                           idx, active))

    timeit(lambda m: pipeline.stage_compact(m, config), mask,
           name="stage_compact")
    timeit(lambda i, a, fe, v, st, rk, ga: pipeline.stage_shade(
        scene, cam, i, a, fe, v, st, config, gaze_target=gtgt,
        rank=rk, gate=ga),
        idx, active, fetched, is_valid, st2, rank, gate,
        name="stage_shade (shade_v+temporal)")
    timeit(lambda u, v_, p, d, hst: reproject.validate_cache(
        u, v_, p, d, st2.prev_camera.eye, w, h, config.cache_epsilon,
        history=hst),
        gbuf["reproject_u"], gbuf["reproject_v"], gbuf["position"],
        st2.depth_cache, st2.history, name="validate_cache")
    timeit(lambda st: pipeline.render_frame(scene, cam, gaze, st, config),
           st2, name="full_fwd")


if __name__ == "__main__":
    main()
