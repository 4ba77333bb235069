"""Decompose the per-live-cluster cost of the fori_loop closest-hit
kernel: loop overhead alone, slab test alone, matmul with dynamic LANE
slice vs 3-D leading-dim indexing. Experiment only.
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
from jax.experimental.pallas import tpu as pltpu


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

    rays, _ = pi.pack_rays16(ro, rd, 1e-3, isect.BIG_T)
    coef, aux, clusters = pi.scene_pack(scene)
    sched, counts = pi.cluster_schedule(rays, clusters)
    cb_flat = clusters.reshape(-1)
    rays = jax.device_put(rays)
    nb = rays.shape[0] // pi.RAY_BLOCK
    nc = clusters.shape[0]
    c = coef.shape[1] // (4 * nc)
    print(f"[micro] nb={nb} nc={nc} c={c} live={int(counts.sum())}",
          file=sys.stderr)

    RB = pi.RAY_BLOCK

    def make_call(kernel, extra_in=(), extra_specs=()):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((RB, 16), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + list(extra_specs),
            out_specs=pl.BlockSpec((RB, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        f = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rays.shape[0], 1), jnp.float32),
        )
        return jax.jit(lambda: f(counts, sched, cb_flat, rays, *extra_in))

    # ---- 1. loop overhead only --------------------------------------
    def k_loop(counts_ref, sched_ref, cb_ref, rays_ref, t_out):
        i = pl.program_id(0)
        t_out[:] = jnp.zeros((RB, 1), jnp.float32)

        def step(l, carry):
            jc = sched_ref[i * nc + l]
            t_out[:] = t_out[:] + jnp.float32(jc)
            return carry

        jax.lax.fori_loop(0, counts_ref[i], step, 0)

    timeit(make_call(k_loop), name="loop overhead only")

    # ---- 2. loop + slab test ----------------------------------------
    def k_slab(counts_ref, sched_ref, cb_ref, rays_ref, t_out):
        i = pl.program_id(0)
        t_out[:] = jnp.full((RB, 1), 1e30, jnp.float32)

        def step(l, carry):
            jc = sched_ref[i * nc + l]
            any_live = pi._ray_slab(rays_ref, cb_ref, jc, t_out[:])

            @pl.when(any_live)
            def _():
                t_out[:] = t_out[:] * 0.5

            return carry

        jax.lax.fori_loop(0, counts_ref[i], step, 0)

    timeit(make_call(k_slab), name="loop + slab")

    # ---- 3. loop + matmul (dynamic lane slice, as today) -------------
    coef_spec = pl.BlockSpec((16, coef.shape[1]), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)

    def k_mm_lane(counts_ref, sched_ref, cb_ref, rays_ref, coef_ref, t_out):
        i = pl.program_id(0)
        t_out[:] = jnp.full((RB, 1), 1e30, jnp.float32)

        def step(l, carry):
            jc = sched_ref[i * nc + l]
            c4 = 4 * c
            cb = coef_ref[:, pl.ds(pl.multiple_of(jc * c4, c4), c4)]
            res = jax.lax.dot_general(rays_ref[:], cb, **pi._MM)
            t_out[:] = jnp.minimum(t_out[:], jnp.min(res, axis=1,
                                                     keepdims=True))
            return carry

        jax.lax.fori_loop(0, counts_ref[i], step, 0)

    timeit(make_call(k_mm_lane, (coef,), (coef_spec,)),
           name="loop + matmul lane-slice f32 HIGHEST")

    # ---- 4. loop + matmul via 3-D leading-dim index -------------------
    coef3 = coef.reshape(16, nc, 4 * c).transpose(1, 0, 2)  # [NC,16,4c]
    coef3 = coef3 + 0.0  # materialize the transpose
    coef3_spec = pl.BlockSpec((nc, 16, 4 * c), lambda i, *_: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    def k_mm_lead(counts_ref, sched_ref, cb_ref, rays_ref, coef_ref, t_out):
        i = pl.program_id(0)
        t_out[:] = jnp.full((RB, 1), 1e30, jnp.float32)

        def step(l, carry):
            jc = sched_ref[i * nc + l]
            cb = coef_ref[jc]
            res = jax.lax.dot_general(rays_ref[:], cb, **pi._MM)
            t_out[:] = jnp.minimum(t_out[:], jnp.min(res, axis=1,
                                                     keepdims=True))
            return carry

        jax.lax.fori_loop(0, counts_ref[i], step, 0)

    timeit(make_call(k_mm_lead, (coef3,), (coef3_spec,)),
           name="loop + matmul 3-D leading-dim f32 HIGHEST")

    # ---- 5. same, bf16 ------------------------------------------------
    coef3_bf = coef3.astype(jnp.bfloat16)
    coef3bf_spec = pl.BlockSpec((nc, 16, 4 * c), lambda i, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    def k_mm_bf(counts_ref, sched_ref, cb_ref, rays_ref, coef_ref, t_out):
        i = pl.program_id(0)
        t_out[:] = jnp.full((RB, 1), 1e30, jnp.float32)

        def step(l, carry):
            jc = sched_ref[i * nc + l]
            cb = coef_ref[jc]
            res = jax.lax.dot_general(
                rays_ref[:].astype(jnp.bfloat16), cb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t_out[:] = jnp.minimum(t_out[:], jnp.min(res, axis=1,
                                                     keepdims=True))
            return carry

        jax.lax.fori_loop(0, counts_ref[i], step, 0)

    timeit(make_call(k_mm_bf, (coef3_bf,), (coef3bf_spec,)),
           name="loop + matmul 3-D leading-dim bf16")

    # ---- 6. full kernel epilogue, 3-D leading dim, f32 HIGH -----------
    mm_high = dict(dimension_numbers=(((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGH)

    def k_full(counts_ref, sched_ref, cb_ref, rays_ref, coef_ref, t_out):
        i = pl.program_id(0)
        t_out[:] = jnp.full((RB, 1), 1e30, jnp.float32)

        def step(l, carry):
            jc = sched_ref[i * nc + l]
            any_live = pi._ray_slab(rays_ref, cb_ref, jc, t_out[:])

            @pl.when(any_live)
            def _():
                cb = coef_ref[jc]
                res = jax.lax.dot_general(rays_ref[:], cb, **mm_high)
                t_num = res[:, 0 * c:1 * c]
                det = res[:, 1 * c:2 * c]
                u_num = res[:, 2 * c:3 * c]
                v_num = res[:, 3 * c:4 * c]
                ud = u_num * det
                vd = v_num * det
                ok = ((jnp.abs(det) > pi.DET_EPS) & (ud >= 0.0)
                      & (vd >= 0.0) & (ud + vd <= det * det))
                t = t_num / jnp.where(jnp.abs(det) > pi.DET_EPS, det, 1.0)
                t = jnp.where(ok & (t > 1e-3), t, 1e30)
                t_out[:] = jnp.minimum(
                    t_out[:], jnp.min(t, axis=1, keepdims=True))

            return carry

        jax.lax.fori_loop(0, counts_ref[i], step, 0)

    timeit(make_call(k_full, (coef3,), (coef3_spec,)),
           name="loop + slab + matmul3D HIGH + epilogue")


if __name__ == "__main__":
    main()
