"""Microbenchmark the Pallas intersection kernel under controlled
conditions: coherent vs incoherent rays, matmul precision, ray block
size. Drives the round-2 kernel redesign (VERDICT task #1/#2).
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
import numpy as np


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
    print(f"[micro] {name:40s} {ms:9.2f} ms", file=sys.stderr, flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="earth")
    p.add_argument("--nrays", type=int, default=2 * 1024 * 1024)
    args = p.parse_args()

    from fovtrace import Camera
    from fovtrace.kernels import intersect as isect
    from fovtrace.kernels import pallas_isect
    from fovtrace.scene import procedural

    scene = procedural.SCENES[args.scene]()
    n = args.nrays
    print(f"[micro] scene={args.scene} tris={scene.num_triangles} "
          f"rays={n} device={jax.devices()[0]}", file=sys.stderr)
    coef, aux, clusters = pallas_isect.scene_pack(scene)
    print(f"[micro] clusters={clusters.shape[0]} width="
          f"{coef.shape[2] // 4}", file=sys.stderr)

    # coherent: primary rays from the bench camera
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    w = 2048
    h = n // w
    ro, rd = cam.primary_rays(w, h)
    ro_c = jnp.asarray(ro.reshape(-1, 3))[:n]
    rd_c = jnp.asarray(rd.reshape(-1, 3))[:n]
    # tile-swizzled coherent (what gbuffer does)
    perm = pallas_isect.tile_swizzle_indices(h, w, 16)[:n]
    ro_cs = ro_c[perm]
    rd_cs = rd_c[perm]

    # incoherent: random origins in bbox, random directions (bounce-like)
    rng = np.random.default_rng(0)
    lo = np.asarray(scene.bbox_min)
    hi = np.asarray(scene.bbox_max)
    ro_i = jnp.asarray(
        rng.uniform(lo, hi, size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd_i = jnp.asarray(d)
    jax.block_until_ready((ro_cs, rd_cs, ro_i, rd_i))

    f = jax.jit(lambda o, dd: pallas_isect.intersect_pallas(
        scene, o, dd, 1e-3, isect.BIG_T))
    timeit(f, ro_c, rd_c, name="closest coherent scanline")
    timeit(f, ro_cs, rd_cs, name="closest coherent tiled")
    timeit(f, ro_i, rd_i, name="closest incoherent")

    fo = jax.jit(lambda o, dd: pallas_isect.occlusion_pallas(
        scene, o, dd, 1e-3, isect.BIG_T))
    timeit(fo, ro_cs, rd_cs, name="occlusion coherent tiled")
    timeit(fo, ro_i, rd_i, name="occlusion incoherent")

    # sorted incoherent: bin by direction octant + origin cell
    key = (
        (np.asarray(rd_i)[:, 0] > 0).astype(np.int64) * 4
        + (np.asarray(rd_i)[:, 1] > 0).astype(np.int64) * 2
        + (np.asarray(rd_i)[:, 2] > 0).astype(np.int64)
    )
    cell = np.floor(
        (np.asarray(ro_i) - lo) / np.maximum(hi - lo, 1e-6) * 8
    ).clip(0, 7).astype(np.int64)
    key = key * 512 + cell[:, 0] * 64 + cell[:, 1] * 8 + cell[:, 2]
    order = np.argsort(key, kind="stable")
    ro_is = ro_i[jnp.asarray(order)]
    rd_is = rd_i[jnp.asarray(order)]
    jax.block_until_ready((ro_is, rd_is))
    timeit(f, ro_is, rd_is, name="closest incoherent SORTED")
    timeit(fo, ro_is, rd_is, name="occlusion incoherent SORTED")

    # brute-force XLA for reference
    fb = jax.jit(lambda o, dd: isect.intersect_brute(
        scene, o, dd, 1e-3, isect.BIG_T))
    timeit(fb, ro_cs, rd_cs, iters=3, name="brute XLA coherent")


if __name__ == "__main__":
    main()
