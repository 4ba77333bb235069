"""Time the pieces OUTSIDE the pallas kernel: ray packing, liveness,
argsort schedule, and the pallas_call itself with a precomputed schedule.
"""

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


def timeit(fn, *args, iters=10, warmup=3, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[micro] {name:44s} {ms:9.2f} ms", file=sys.stderr, flush=True)
    return ms, out


def main():
    from fovtrace import Camera
    from fovtrace.kernels import intersect as isect
    from fovtrace.kernels import pallas_isect as pi
    from fovtrace.scene import procedural

    from fovtrace.core import vec

    scene = procedural.SCENES["earth"]()
    n = 2 * 1024 * 1024
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    w = 2048
    h = n // w
    rov, rdv = cam.primary_rays_v(w, h)
    perm = pi.tile_swizzle_indices(h, w, 16)[:n]
    ro = rov.map(lambda a: a.reshape(-1)[:n][perm])
    rd = rdv.map(lambda a: a.reshape(-1)[:n][perm])
    jax.block_until_ready((ro, rd))

    coef, aux, clusters = pi.scene_pack(scene)
    jax.block_until_ready((coef, aux, clusters))

    f_pack = jax.jit(lambda o, d: pi.pack_raysT(o, d, 1e-3, isect.BIG_T)[0])
    _, rays = timeit(f_pack, ro, rd, name="pack_raysT")

    f_live = jax.jit(lambda r: pi.block_liveness(r, clusters))
    timeit(f_live, rays, name="block_liveness")

    f_sched = jax.jit(lambda r: pi.cluster_schedule(r, clusters))
    _, (sched, counts, params) = timeit(
        f_sched, rays, name="cluster_schedule (incl. argsort)")

    interp = jax.default_backend() != "tpu"
    f_call = jax.jit(lambda r, s, c, p: pi._closest_call_pre(
        r, coef, s, c, p, interp))
    timeit(f_call, rays, sched, counts, params, name="pallas_call only")

    f_all = jax.jit(lambda o, d: pi.intersect_pallas(scene, o, d, 1e-3,
                                                     isect.BIG_T))
    timeit(f_all, ro, rd, name="intersect_pallas end-to-end")


if __name__ == "__main__":
    main()
