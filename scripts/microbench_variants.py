"""Microbench kernel variants: matmul precision, cluster width.

Monkeypatches pallas_isect knobs to measure their effect before
committing to a redesign.
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
    print(f"[micro] {name:44s} {ms:9.2f} ms", file=sys.stderr, flush=True)
    return ms, out


def make_rays(scene, n, coherent=True):
    from fovtrace import Camera
    from fovtrace.kernels import pallas_isect

    if coherent:
        cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
        w = 2048
        h = n // w
        ro, rd = cam.primary_rays(w, h)
        ro = jnp.asarray(ro.reshape(-1, 3))[:n]
        rd = jnp.asarray(rd.reshape(-1, 3))[:n]
        perm = pallas_isect.tile_swizzle_indices(h, w, 16)[:n]
        return ro[perm], rd[perm]
    rng = np.random.default_rng(0)
    lo = np.asarray(scene.bbox_min)
    hi = np.asarray(scene.bbox_max)
    ro = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # sorted by octant+cell (the pipeline will do this)
    key = ((d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)).astype(np.int64)
    cell = np.floor((ro - lo) / np.maximum(hi - lo, 1e-6) * 8).clip(0, 7).astype(np.int64)
    key = key * 512 + cell[:, 0] * 64 + cell[:, 1] * 8 + cell[:, 2]
    order = np.argsort(key, kind="stable")
    return jnp.asarray(ro[order]), jnp.asarray(d[order])


def main():
    from fovtrace.kernels import intersect as isect
    from fovtrace.kernels import pallas_isect
    from fovtrace.scene import procedural

    scene = procedural.SCENES["earth"]()
    n = 2 * 1024 * 1024
    ro_c, rd_c = make_rays(scene, n, True)
    ro_i, rd_i = make_rays(scene, 512 * 1024, False)
    jax.block_until_ready((ro_c, rd_c, ro_i, rd_i))
    print(f"[micro] tris={scene.num_triangles} device={jax.devices()[0]}",
          file=sys.stderr)

    results = {}
    for prec_name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("HIGH", jax.lax.Precision.HIGH),
                            ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        for mc, label in [(24, "c256"), (48, "c128"), (96, "c128x")]:
            pallas_isect._MM = dict(
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            pallas_isect.MAX_CLUSTERS = mc
            sc = scene.with_pack()
            try:
                f = jax.jit(lambda o, d, s=sc: pallas_isect.intersect_pallas(
                    s, o, d, 1e-3, isect.BIG_T))
                ms, out = timeit(f, ro_c, rd_c,
                                 name=f"closest coh {prec_name} {label}")
                results[(prec_name, label, "coh")] = (ms, out)
                ms2, out2 = timeit(f, ro_i, rd_i,
                                   name=f"closest inc-sorted {prec_name} {label}")
            except Exception as e:
                print(f"[micro] {prec_name} {label} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr)

    # correctness vs HIGHEST c256
    base = results.get(("HIGHEST", "c256", "coh"))
    for k, (ms, out) in results.items():
        if base is None:
            break
        mismatch = int(jnp.sum(out.tri != base[1].tri))
        terr = float(jnp.max(jnp.abs(jnp.where(
            (out.tri == base[1].tri) & (out.tri >= 0), out.t - base[1].t, 0.0))))
        print(f"[micro] {k}: tri mismatches={mismatch} max|dt|={terr:.2e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
