"""Decompose the shading stage on the bench wavefront: isolate the
intersect/occlusion kernels, refine_hit, hit_surface, NEE, and the
arithmetic + compaction glue. Drives the round-2 shade optimization."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[shade] {name:36s} {ms:9.2f} ms", file=sys.stderr, flush=True)
    return ms, out


def main():
    from fovtrace import Camera, RenderConfig
    from fovtrace.core import rng
    from fovtrace.kernels import intersect as isect
    from fovtrace.kernels import pallas_isect, sampling
    from fovtrace.render import pipeline, shade as shade_mod
    from fovtrace.scene import procedural

    config = RenderConfig(width=1920, height=1088, reconstruction="atrous",
                          max_depth=4, diffuse_max_depth=1,
                          ray_budget_frac=0.30)
    scene = procedural.SCENES["earth"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    w, h = config.width, config.height
    n = config.ray_budget
    print(f"[shade] budget={n} tris={scene.num_triangles} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    # realistic compacted wavefront: foveated mask rays
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))
    gdist = sampling.gaze_distance(h, w, gaze)
    mask = sampling.masked_sampling(h, w, gdist,
                                    jnp.zeros((h, w)), config.aperture)
    idx, active = sampling.compact_rays(mask, n)
    seeds = rng.pixel_seed(idx, jnp.asarray(0))
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)
    ndc_x = (px + 0.5) / w * 2.0 - 1.0
    ndc_y = (py + 0.5) / h * 2.0 - 1.0
    dirs = pipeline._unproject(cam, ndc_x, ndc_y, w, h)
    origins = jnp.broadcast_to(cam.eye, dirs.shape)
    jax.block_until_ready((origins, dirs, seeds))

    eps = config.scene_epsilon

    from fovtrace.core import vec as vecm
    _fr = vecm.from_rows

    # raw kernel (no refine)
    f_raw = jax.jit(lambda o, d: pallas_isect.intersect_pallas(
        scene, _fr(o), _fr(d), eps, isect.BIG_T))
    _, hit_raw = timeit(f_raw, origins, dirs, name="pallas closest (raw)")

    # refine_hit alone
    f_ref = jax.jit(lambda o, d, ht: isect.refine_hit(scene, o, d, ht))
    timeit(f_ref, origins, dirs, hit_raw, name="refine_hit")

    # full intersect dispatcher
    f_int = jax.jit(lambda o, d: isect.intersect(scene, o, d, eps,
                                                 isect.BIG_T))
    _, hit = timeit(f_int, origins, dirs, name="intersect (kernel+refine)")

    # hit_surface
    f_surf = jax.jit(lambda o, d, ht: isect.hit_surface(scene, o, d, ht))
    _, surf = timeit(f_surf, origins, dirs, hit, name="hit_surface")

    # material lookup (the big 11-column one from shade)
    mats = scene.materials
    safe_mat = jnp.maximum(surf["mat_id"], 0)

    def f_mat(sm):
        return isect.material_lookup(
            mats, sm,
            [("kind", 1), ("ks", 3), ("phong_exp", 1),
             ("reflectivity_n", 3), ("ior", 1), ("extinction", 3),
             ("refraction_color", 3), ("reflection_color", 3),
             ("fresnel_exponent", 1), ("fresnel_minimum", 1),
             ("fresnel_maximum", 1)])

    timeit(jax.jit(f_mat), safe_mat, name="material_lookup x11")

    # NEE (occlusion + light arithmetic)
    from fovtrace.core import mathx

    n_sh = mathx.faceforward(surf["normal"], -dirs, surf["gnormal"])

    def f_nee(point, normal, kd, sd):
        return shade_mod.nee_direct(
            scene, point, normal, kd, sd, config,
            ks=jnp.ones((n, 3)), phong_exp=jnp.full((n,), 88.0),
            wo=dirs, enabled=hit.tri >= 0)

    timeit(jax.jit(f_nee), surf["point"], n_sh, surf["kd"], seeds,
           name="nee_direct (occl + light)")

    # occlusion kernel alone on the shadow rays
    light = scene.light
    lp = light.corner + 0.5 * light.v1 + 0.5 * light.v2
    to_l = lp - surf["point"]
    ld = jnp.linalg.norm(to_l, axis=-1)
    ldir = to_l / ld[:, None]
    o2 = surf["point"] + n_sh * eps
    tmax = jnp.where(hit.tri >= 0, ld - eps, -1.0)
    jax.block_until_ready((o2, ldir, tmax))
    f_occ = jax.jit(lambda o, d, tm: pallas_isect.occlusion_pallas(
        scene, _fr(o), _fr(d), eps, tm))
    timeit(f_occ, o2, ldir, tmax, name="occlusion (shadow rays)")

    # full shade fwd
    f_shade = jax.jit(lambda o, d, sd: shade_mod.shade(scene, o, d, sd,
                                                       config))
    timeit(f_shade, origins, dirs, seeds, iters=5, name="shade fwd (4 bounces)")

    # shade with max_depth=1 (single bounce, no compaction)
    cfg1 = config.replace(max_depth=1)
    f_shade1 = jax.jit(lambda o, d, sd: shade_mod.shade(scene, o, d, sd,
                                                        cfg1))
    timeit(f_shade1, origins, dirs, seeds, iters=5, name="shade fwd (1 bounce)")

    cfg2 = config.replace(max_depth=2)
    f_shade2 = jax.jit(lambda o, d, sd: shade_mod.shade(scene, o, d, sd,
                                                        cfg2))
    timeit(f_shade2, origins, dirs, seeds, iters=5, name="shade fwd (2 bounces)")


if __name__ == "__main__":
    main()
