"""Experiment: does octant-sorting the bounce wavefront speed up the
Pallas intersection kernel?

Secondary (GI) rays have cosine-sampled directions: every 256-ray block
mixes all 8 direction octants, so the interval bundle test's direction
interval straddles zero in every component -> no slab constraint -> the
kernel iterates every cluster. Sorting the compacted wavefront by
direction octant (stable, preserving the screen-tile origin coherence)
should tighten the bundles dramatically.

Prints per-variant kernel ms + mean live clusters per block.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovtrace import Camera, RenderConfig
from fovtrace.core import rng, vec
from fovtrace.kernels import intersect as isect
from fovtrace.kernels import pallas_isect as pk
from fovtrace.render import pipeline
from fovtrace.scene import procedural


def timeit(fn, *args, iters=16, name=""):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    for _ in range(2):
        jax.block_until_ready(jax.tree.leaves(f(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[exp] {name:32s} {ms:9.2f} ms", flush=True)
    return ms


def live_clusters(scene, ro, rd, t_min, t_max):
    raysT, _ = pk.pack_raysT(ro, rd, t_min, t_max)
    coef, _aux, clusters = pk.scene_pack(scene)
    _, counts, _ = pk.cluster_schedule(raysT, clusters)
    return float(jnp.mean(counts.astype(jnp.float32)))


def main():
    config = RenderConfig(width=1920, height=1088, reconstruction="atrous",
                          max_depth=4, diffuse_max_depth=1,
                          ray_budget_frac=0.30, full_outputs=False)
    w, h = config.width, config.height
    scene = procedural.SCENES["earth"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    budget = config.ray_budget
    print(f"[exp] budget={budget} device={jax.devices()[0]}", flush=True)

    # --- build a realistic bounce-1 wavefront --------------------------
    from fovtrace.kernels import sampling as sampling_mod
    from fovtrace.kernels import saliency
    from fovtrace.render import gbuffer as gbuffer_mod

    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))
    gbuf = jax.jit(lambda s, c: gbuffer_mod.trace_gbuffer(
        s, c, c, w, h, config))(scene, cam)
    bbox_diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)
    sal = saliency.compute_saliency(gbuf, gaze, bbox_diag,
                                    config.saliency_block)
    gdist = sampling_mod.gaze_distance(h, w, gaze)
    mask = sampling_mod.masked_sampling(h, w, gdist, sal, config.aperture,
                                        config.extra_sample_rate)
    idx, active, rank, gate = pipeline.stage_compact(mask, config)

    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)
    ndc_x = (px + 0.5) / w * 2.0 - 1.0
    ndc_y = (py + 0.5) / h * 2.0 - 1.0
    _, dirs = cam.unproject_v(ndc_x, ndc_y, float(w) / float(h))
    origins = vec.splat(cam.eye, dirs.shape)

    @jax.jit
    def bounce1(o, d):
        hit = isect.intersect_v(scene, o, d, config.scene_epsilon,
                                isect.BIG_T, backend="pallas")
        surf = isect.hit_surface_v(scene, o, d, hit)
        n_sh = vec.faceforward(surf["normal"], -d, surf["gnormal"])
        seeds = rng.pixel_seed(idx, jnp.asarray(1, jnp.int32))
        z1, seeds = rng.rnd(seeds)
        z2, seeds = rng.rnd(seeds)
        lx, ly, lz = vec.cosine_sample_hemisphere(z1, z2)
        gi = vec.to_world(lx, ly, lz, n_sh)
        org = surf["point"] + surf["gnormal"] * config.scene_epsilon
        alive = hit.valid
        return org, gi, alive

    org, gi, alive = bounce1(origins, dirs)
    jax.block_until_ready(alive)
    n = org.x.shape[0]
    tmax = jnp.where(alive, isect.BIG_T, -1.0)
    print(f"[exp] bounce-1 wavefront: {n} rays, "
          f"{int(jnp.sum(alive))} alive", flush=True)

    # --- variant 0: primary rays (coherence ceiling) --------------------
    print(f"[exp] live clusters primary: "
          f"{live_clusters(scene, origins, dirs, 1e-3, jnp.full((n,), isect.BIG_T)):.2f}",
          flush=True)
    timeit(lambda o, d: isect.intersect_v(scene, o, d, 1e-3, isect.BIG_T,
                                          backend="pallas"),
           origins, dirs, name="isect primary (coherent)")

    # --- variant 1: bounce-1 unsorted -----------------------------------
    print(f"[exp] live clusters bounce1 unsorted: "
          f"{live_clusters(scene, org, gi, 1e-3, tmax):.2f}", flush=True)
    timeit(lambda o, d, tm: isect.intersect_v(scene, o, d, 1e-3, tm,
                                              backend="pallas"),
           org, gi, tmax, name="isect bounce1 unsorted")

    # --- variant 2: bounce-1 octant-sorted (stable) ----------------------
    @jax.jit
    def octant_sort(o, d, tm, alv):
        oct_ = ((d.x < 0).astype(jnp.int32) * 4
                + (d.y < 0).astype(jnp.int32) * 2
                + (d.z < 0).astype(jnp.int32))
        oct_ = jnp.where(alv, oct_, 8)  # dead rays to the tail
        # stable counting sort by 9 buckets via rank = offset[bucket] +
        # position-within-bucket (two cumsums)
        one = jnp.ones_like(oct_)
        sizes = jnp.zeros((9,), jnp.int32).at[oct_].add(one)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(sizes)[:-1]])
        within = jnp.cumsum(
            jax.nn.one_hot(oct_, 9, dtype=jnp.int32), axis=0
        )[jnp.arange(o.x.shape[0]), oct_] - 1
        dest = offs[oct_] + within
        inv = jnp.zeros_like(dest).at[dest].set(
            jnp.arange(o.x.shape[0], dtype=jnp.int32))
        return o.gather(inv), d.gather(inv), tm[inv]

    os_, ds_, tms_ = octant_sort(org, gi, tmax, alive)
    jax.block_until_ready(tms_)
    print(f"[exp] live clusters bounce1 octant-sorted: "
          f"{live_clusters(scene, os_, ds_, 1e-3, tms_):.2f}", flush=True)
    timeit(lambda o, d, tm: isect.intersect_v(scene, o, d, 1e-3, tm,
                                              backend="pallas"),
           os_, ds_, tms_, name="isect bounce1 octant-sorted")
    timeit(octant_sort, org, gi, tmax, alive, name="octant_sort itself")


if __name__ == "__main__":
    main()
