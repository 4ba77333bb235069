"""Decompose the closest-hit kernel's live-step cost: matmul dtype,
epilogue weight, ray block size. Monkeypatches pallas_isect internals —
experiment only.
"""

import functools
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
from jax.experimental import pallas as pl


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

    scene = procedural.SCENES["earth"]()
    n = 2 * 1024 * 1024
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    w = 2048
    h = n // w
    ro, rd = cam.primary_rays(w, h)
    ro = jnp.asarray(ro.reshape(-1, 3))[:n]
    rd = jnp.asarray(rd.reshape(-1, 3))[:n]
    perm = pi.tile_swizzle_indices(h, w, 16)[:n]
    ro, rd = ro[perm], rd[perm]
    jax.block_until_ready((ro, rd))

    # liveness stats
    rays, _ = pi.pack_rays16(ro, rd, 1e-3, isect.BIG_T)
    coef, aux, clusters = pi.scene_pack(scene)
    live, _ = pi.block_liveness(rays, clusters)
    nb, nc = live.shape
    print(f"[micro] blocks={nb} clusters={nc} live_pairs={int(live.sum())} "
          f"({float(live.mean())*100:.1f}% — avg {float(live.sum())/nb:.1f} "
          f"clusters/block)", file=sys.stderr)

    f0 = jax.jit(lambda o, d: pi.intersect_pallas(scene, o, d, 1e-3, isect.BIG_T))
    base_ms, base = timeit(f0, ro, rd, name="baseline f32")

    orig_mt = pi._mt_from_matmul

    # ---- variant: bf16 matmul ------------------------------------------
    def mt_bf16(f, coef_ref, j, tmin, tmax, c):
        c4 = 4 * c
        cb = coef_ref[:, pl.ds(pl.multiple_of(j * c4, c4), c4)]
        res = jax.lax.dot_general(
            f.astype(jnp.bfloat16), cb.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_num = res[:, 0 * c:1 * c]
        det = res[:, 1 * c:2 * c]
        u_num = res[:, 2 * c:3 * c]
        v_num = res[:, 3 * c:4 * c]
        ud = u_num * det
        vd = v_num * det
        ok = ((jnp.abs(det) > pi.DET_EPS) & (ud >= 0.0) & (vd >= 0.0)
              & (ud + vd <= det * det))
        inv_det = 1.0 / jnp.where(jnp.abs(det) > pi.DET_EPS, det, 1.0)
        t = t_num * inv_det
        ok = ok & (t > tmin) & (t < tmax)
        return t, inv_det, u_num, v_num, ok, det

    pi._mt_from_matmul = mt_bf16
    f1 = jax.jit(lambda o, d: pi.intersect_pallas(scene, o, d, 1e-3, isect.BIG_T))
    timeit(f1, ro, rd, name="bf16 matmul")

    # ---- variant: matmul only, trivial epilogue --------------------------
    def mt_cheap(f, coef_ref, j, tmin, tmax, c):
        c4 = 4 * c
        cb = coef_ref[:, pl.ds(pl.multiple_of(j * c4, c4), c4)]
        res = jax.lax.dot_general(f, cb, **pi._MM)
        t = res[:, 0 * c:1 * c]
        det = res[:, 1 * c:2 * c]
        ok = det > 0.0  # fake: skips real hit logic
        return t, det, det, det, ok, det

    pi._mt_from_matmul = mt_cheap
    f2 = jax.jit(lambda o, d: pi.intersect_pallas(scene, o, d, 1e-3, isect.BIG_T))
    timeit(f2, ro, rd, name="f32 matmul + cheap hit-test")

    pi._mt_from_matmul = orig_mt

    # ---- variant: RAY_BLOCK 512 / 128 ------------------------------------
    for rb in (512, 128):
        pi.RAY_BLOCK = rb
        f3 = jax.jit(lambda o, d: pi.intersect_pallas(
            scene, o, d, 1e-3, isect.BIG_T))
        timeit(f3, ro, rd, name=f"RAY_BLOCK={rb}")
    pi.RAY_BLOCK = 256

    # correctness of bf16 winner ids vs f32
    pi._mt_from_matmul = mt_bf16
    f1b = jax.jit(lambda o, d: pi.intersect_pallas(scene, o, d, 1e-3, isect.BIG_T))
    hb = f1b(ro, rd)
    pi._mt_from_matmul = orig_mt
    mism = int(jnp.sum(hb.tri != base.tri))
    both_hit = int(jnp.sum((hb.tri >= 0) == (base.tri >= 0)))
    print(f"[micro] bf16 vs f32: tri mismatch={mism}/{n} "
          f"hit/miss agree={both_hit}/{n}", file=sys.stderr)


if __name__ == "__main__":
    main()
