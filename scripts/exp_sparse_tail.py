"""Where does the dense-vs-sparse shading-ray cost go?

Splits the tile-major compacted bench wavefront into its dense head
(fovea+bands) and sparse tail (periphery floor), and times closest-hit
and NEE-style occlusion on each segment separately. Timing: deep queue +
fetch of the last value (block_until_ready does not wait over the axon
tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, name, *a, iters=16):
    g = jax.jit(lambda *a: sum(jnp.sum(l.astype(jnp.float32) ** 2)
                               for l in jax.tree.leaves(f(*a))))
    float(g(*a))
    float(g(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = g(*a)
    float(out)
    print(f"[tail] {name:40s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms",
          flush=True)


def main():
    from fovtrace import Camera, RenderConfig
    from fovtrace.core import rng, vec
    from fovtrace.kernels import intersect as isect, pallas_isect
    from fovtrace.render import pipeline, shade as shade_mod
    from fovtrace.scene import procedural

    config = RenderConfig(width=1920, height=1088, reconstruction="atrous",
                          max_depth=4, diffuse_max_depth=1,
                          ray_budget_frac=0.50, full_outputs=False)
    w, h = config.width, config.height
    scene = procedural.SCENES["earth"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))

    gbuf = pipeline.stage_gbuffer(scene, cam, state.prev_camera, config)
    mask, sal, is_valid, fetched, gtgt, rcnt = pipeline.stage_sampling(
        scene, gbuf, gaze, state, config)
    idx, active, rank, gate = pipeline.stage_compact(mask, config)
    n_set = int(jnp.sum(mask))
    print(f"[tail] mask={n_set} budget={config.ray_budget}", flush=True)

    seeds = rng.pixel_seed(idx, jnp.asarray(0))
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)
    _, dirs = cam.unproject_v(px / w * 2 - 1, py / h * 2 - 1, w / h)
    origins = vec.splat(cam.eye, dirs.shape)

    eps = config.scene_epsilon
    segs = {"dense 0-627k": slice(0, 626688),
            "tail 627k-end": slice(626688, n_set // 1024 * 1024)}
    for name, sl in segs.items():
        o = origins.map(lambda a: a[sl])
        d = dirs.map(lambda a: a[sl])
        nseg = o.x.shape[0]
        timeit(lambda o, d: pallas_isect.intersect_pallas(
            scene, o, d, eps, isect.BIG_T), f"closest {name} ({nseg})", o, d)
        hit, surf = isect.intersect_surface_v(scene, o, d, eps, isect.BIG_T)
        light = scene.light
        lp = vec.of(light.corner + 0.5 * light.v1 + 0.5 * light.v2)
        to_l = lp - surf["point"]
        ld = vec.length(to_l)
        l = to_l * (1.0 / jnp.maximum(ld, 1e-20))
        oo = surf["point"] + surf["gnormal"] * eps
        tmax = jnp.where(hit.valid, ld - eps, -1.0)
        timeit(lambda o2, l2, tm: pallas_isect.occlusion_pallas(
            scene, o2, l2, eps, tm), f"occlusion {name}", oo, l, tmax)
        sd = seeds[sl]
        timeit(lambda o2, d2, s2: shade_mod.shade_v(scene, o2, d2, s2,
                                                    config),
               f"shade_v {name}", o, d, sd)


if __name__ == "__main__":
    main()
