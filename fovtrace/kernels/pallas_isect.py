"""Pallas TPU ray/triangle intersection — the hot kernel.

TPU-native replacement for OptiX `rtTrace` + Trbvh traversal
(`REF/PathTracer.cpp:641`, `REF/cuda/triangle_mesh.cu:59-106`). There are
no RT cores and no efficient pointer-chasing on TPU, so the design maps
the problem onto the MXU + VPU instead:

  clustering  triangles are sorted into CLUSTERS of 128 (contiguous
              blocks in BVH leaf order -> spatially coherent) with
              precomputed AABBs; every shape is static.
  culling     each ray block (256 rays) sweeps the cluster list; a
              vectorized slab test + `any` reduction decides whether ANY
              ray can hit the cluster and `lax.cond` SKIPS the whole
              tile when none can (predicated execution — the TPU analog
              of packet traversal).
  MXU         Moller-Trumbore is reformulated as determinants linear in
              the 10-dim ray feature f = [o, d, o x d, 1] (Cramer /
              Plucker form):
                  det   = f . [0,   -n,      0,  0      ]
                  t*det = f . [n,    0,      0,  -v0.n  ]
                  u*det = f . [0,  v0 x e2,  e2, 0      ]
                  v*det = f . [0,  e1 x v0, -e1, 0      ]
              so one [256,16] x [16, 4*128] f32 matmul per live cluster
              produces all four quantities for 128 triangles — the FLOPs
              ride the systolic array instead of the VPU, leaving only a
              ~12-op elementwise epilogue (divide, compares, argmin).

Outputs feed `intersect.refine_hit`, which recomputes (t,u,v) for the
winning triangle differentiably — the kernel itself runs under
stop_gradient (SURVEY.md §7 hard part #3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovtrace.kernels.intersect import BIG_T, DET_EPS, Hit

CLUSTER = 128      # minimum triangles per cluster (lane width)
MAX_CLUSTERS = 24  # cap on clusters/scene so the schedule fits SMEM (1MB)
RAY_BLOCK = 256    # rays per program


def pick_cluster(t_pad_min: int) -> int:
    """Cluster width for a scene of ~t triangles: smallest power-of-two
    multiple of CLUSTER keeping the cluster count <= MAX_CLUSTERS (the
    flat per-block schedule must fit scalar memory). Large scenes get
    coarser clusters; a supercluster hierarchy is the planned upgrade."""
    c = CLUSTER
    while (t_pad_min + c - 1) // c > MAX_CLUSTERS:
        c *= 2
    return c
_MM = dict(
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,   # true f32 on the MXU
)


def _interpret() -> bool:
    """Pallas kernels interpret on CPU (tests / dryrun) and compile on TPU."""
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------- packing
def compute_pack(scene):
    """(coef [16, 4*T_pad], aux [8, T_pad], clusters [NC, 8]).

    coef column layout per cluster j: [t_num | det | u_num | v_num],
    each CLUSTER wide. Padding triangles have all-zero coefficients ->
    det = 0 -> never hit. aux rows: transparent, shadow_att rgb,
    1/|e1 x e2| (for |cos| = |det|/|n| in the occlusion fresnel).
    """
    from fovtrace.scene.scene import MATL_REFRACTION

    v0, e1, e2 = scene.v0, scene.e1, scene.e2
    t = v0.shape[0]
    c = pick_cluster(t)
    pad = (-t) % c
    padv = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    v0, e1, e2 = padv(v0), padv(e1), padv(e2)
    t_pad = v0.shape[0]
    nc = t_pad // c

    n = jnp.cross(e1, e2)
    v0xe2 = jnp.cross(v0, e2)
    e1xv0 = jnp.cross(e1, v0)
    v0n = jnp.sum(v0 * n, axis=-1)

    # [16, T_pad, 4] then interleave to [16, NC * 4 * c]
    coef = jnp.zeros((16, t_pad, 4), jnp.float32)
    coef = coef.at[0:3, :, 0].set(n.T)          # t_num: o-part
    coef = coef.at[9, :, 0].set(-v0n)           # t_num: const
    coef = coef.at[3:6, :, 1].set(-n.T)         # det:   d-part
    coef = coef.at[3:6, :, 2].set(v0xe2.T)      # u_num: d-part
    coef = coef.at[6:9, :, 2].set(e2.T)         # u_num: w-part
    coef = coef.at[3:6, :, 3].set(e1xv0.T)      # v_num: d-part
    coef = coef.at[6:9, :, 3].set(-e1.T)        # v_num: w-part
    coef = (
        coef.reshape(16, nc, c, 4)
        .transpose(0, 1, 3, 2)                  # [16, NC, 4, c]
        .reshape(16, t_pad * 4)
    )

    mats = scene.materials
    safe = jnp.maximum(scene.mat_id, 0)
    kind = jnp.where(scene.mat_id >= 0, mats.kind[safe], -1)
    transp = jnp.pad((kind == MATL_REFRACTION).astype(jnp.float32), (0, pad))
    sa = jnp.where(scene.mat_id[:, None] >= 0, mats.shadow_attenuation[safe],
                   jnp.ones((1, 3), jnp.float32))
    sa = jnp.pad(sa, ((0, pad), (0, 0)), constant_values=1.0)
    inv_n = 1.0 / jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-20)
    aux = jnp.zeros((8, t_pad), jnp.float32)
    aux = (
        aux.at[0].set(transp)
        .at[1].set(sa[:, 0]).at[2].set(sa[:, 1]).at[3].set(sa[:, 2])
        .at[4].set(inv_n)
    )

    # cluster AABBs (padding triangles excluded via degenerate test)
    v0c = v0.reshape(nc, c, 3)
    e1c = e1.reshape(nc, c, 3)
    e2c = e2.reshape(nc, c, 3)
    v1c = v0c + e1c
    v2c = v0c + e2c
    degen = (jnp.sum(e1c * e1c, -1) + jnp.sum(e2c * e2c, -1)) == 0.0
    big = jnp.float32(BIG_T)
    lo = jnp.where(degen[..., None], big,
                   jnp.minimum(jnp.minimum(v0c, v1c), v2c))
    hi = jnp.where(degen[..., None], -big,
                   jnp.maximum(jnp.maximum(v0c, v1c), v2c))
    clusters = jnp.zeros((nc, 8), jnp.float32)
    clusters = clusters.at[:, 0:3].set(jnp.min(lo, axis=1))
    clusters = clusters.at[:, 3:6].set(jnp.max(hi, axis=1))
    return coef, aux, clusters


def scene_pack(scene):
    """Packed intersection data, preferring the precomputed pack stored
    on the Scene pytree (`Scene.with_pack`, built by `with_bvh` so
    triangles are in BVH leaf order)."""
    if getattr(scene, "isect_coef", None) is not None:
        return scene.isect_coef, scene.isect_aux, scene.cluster_aabb
    return compute_pack(scene)


def pack_rays16(ro, rd, t_min, t_max) -> Tuple[jnp.ndarray, int]:
    """[N_pad, 16] ray features:
    o(3), d(3), w = o x d (3), 1, t_min, t_max, 1/d (3), 0.

    Columns 0-9 are the matmul feature vector (coef rows 10-15 are zero,
    so the trailing slab-test columns don't pollute the contraction)."""
    n = ro.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    w = jnp.cross(ro, rd)
    ones = jnp.ones((n, 1), jnp.float32)
    eps = jnp.float32(1e-12)
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < eps,
                            jnp.where(rd < 0, -eps, eps), rd)
    zeros = jnp.zeros((n, 1), jnp.float32)
    rays = jnp.concatenate(
        [ro, rd, w, ones, t_min[:, None], t_max[:, None], inv_d, zeros],
        axis=1,
    )
    pad = (-n) % RAY_BLOCK
    if pad:
        filler = jnp.zeros((pad, 16), jnp.float32)
        # padding rays: d=(1,0,0), t_max=-1 -> never hit
        filler = filler.at[:, 3].set(1.0).at[:, 11].set(-1.0)
        filler = filler.at[:, 12:15].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)
    return rays, n


# --------------------------------------------------- block-sparse liveness
def block_liveness(rays: jnp.ndarray, clusters: jnp.ndarray) -> jnp.ndarray:
    """Conservative [NB, NC] bool: can ANY ray of block i hit cluster j?

    Interval-arithmetic ray-bundle vs AABB slab test: per component, the
    bundle's entry-t lower bound is the min over the four (origin
    extreme / direction extreme) division corners, the exit-t upper
    bound the max; a direction interval straddling zero gives an
    unbounded component (no constraint). If max_k(entry lower bound) >
    min_k(exit upper bound), NO ray in the bundle can hit — a valid
    conservative cull. Computed densely in XLA (NB*NC is tiny); the
    result drives the Pallas block-sparse grid so dead (block, cluster)
    steps are true no-ops.
    """
    nb = rays.shape[0] // RAY_BLOCK
    rb = rays.reshape(nb, RAY_BLOCK, 16)
    o_lo = jnp.min(rb[..., 0:3], axis=1)   # [NB,3]
    o_hi = jnp.max(rb[..., 0:3], axis=1)
    d_lo = jnp.min(rb[..., 3:6], axis=1)
    d_hi = jnp.max(rb[..., 3:6], axis=1)
    tmin_lo = jnp.min(rb[..., 10], axis=1)          # [NB]
    tmax_hi = jnp.max(rb[..., 11], axis=1)

    b_lo = clusters[:, 0:3]                # [NC,3]
    b_hi = clusters[:, 3:6]

    # numerator interval for (b - o): [c1, c2]
    c1 = b_lo[None, :, :] - o_hi[:, None, :]        # [NB,NC,3]
    c2 = b_hi[None, :, :] - o_lo[:, None, :]

    eps = jnp.float32(1e-12)
    zero_span = (d_lo[:, None, :] <= eps) & (d_hi[:, None, :] >= -eps)
    safe = lambda d: jnp.where(jnp.abs(d) < eps,
                               jnp.where(d < 0, -eps, eps), d)
    i1 = 1.0 / safe(d_lo)[:, None, :]
    i2 = 1.0 / safe(d_hi)[:, None, :]

    corners = jnp.stack([c1 * i1, c1 * i2, c2 * i1, c2 * i2], axis=0)
    t_lo = jnp.min(corners, axis=0)        # [NB,NC,3]
    t_hi = jnp.max(corners, axis=0)
    big = jnp.float32(BIG_T)
    t_lo = jnp.where(zero_span, -big, t_lo)
    t_hi = jnp.where(zero_span, big, t_hi)

    tenter = jnp.maximum(jnp.max(t_lo, axis=-1), tmin_lo[:, None])
    texit = jnp.minimum(jnp.min(t_hi, axis=-1), tmax_hi[:, None])
    # empty (inverted) cluster boxes never pass
    nonempty = jnp.all(b_lo <= b_hi, axis=-1)[None, :]
    return (tenter <= texit) & nonempty, tenter


def cluster_schedule(rays: jnp.ndarray, clusters: jnp.ndarray) -> jnp.ndarray:
    """Flat [NB * NC] i32 cluster schedule for scalar prefetch.

    Per ray block: live clusters sorted FRONT-TO-BACK by conservative
    entry-t (so the kernel's running best-t early-out can skip occluded
    clusters), dead clusters compacted to the tail as -1 (no-op steps).
    1-D because SMEM pads the last axis of 2-D scalar arrays to 128
    lanes.
    """
    live, tenter = block_liveness(rays, clusters)
    key = jnp.where(live, tenter, jnp.float32(BIG_T))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)      # [NB, NC]
    live_sorted = jnp.take_along_axis(live, order, axis=1)
    sched = jnp.where(live_sorted, order, -1)
    return sched.reshape(-1)


def _mt_from_matmul(f, coef_ref, j, tmin, tmax, c: int):
    """One MXU matmul -> (t, inv_det, u_num, v_num, ok, det) [R, CLUSTER]
    for cluster j. Sign-test formulation keeps the epilogue lean:
    u >= 0        <=>  u_num * det >= 0
    v >= 0        <=>  v_num * det >= 0
    u + v <= 1    <=>  (u_num + v_num) * det <= det^2
    """
    c4 = 4 * c
    cb = coef_ref[:, pl.ds(pl.multiple_of(j * c4, c4), c4)]   # [16, 4c]
    res = jax.lax.dot_general(f, cb, **_MM)                   # [R, 4c]
    t_num = res[:, 0 * c:1 * c]
    det = res[:, 1 * c:2 * c]
    u_num = res[:, 2 * c:3 * c]
    v_num = res[:, 3 * c:4 * c]
    ud = u_num * det
    vd = v_num * det
    ok = (
        (jnp.abs(det) > DET_EPS)
        & (ud >= 0.0) & (vd >= 0.0)
        & (ud + vd <= det * det)
    )
    inv_det = 1.0 / jnp.where(jnp.abs(det) > DET_EPS, det, 1.0)
    t = t_num * inv_det
    ok = ok & (t > tmin) & (t < tmax)
    return t, inv_det, u_num, v_num, ok, det


# ------------------------------------------------------------ closest hit
def _ray_slab(rays_ref, cb_ref, jc, upper):
    """Per-ray slab test of the block against cluster jc (bounds from the
    prefetched flat [NC*8] SMEM array). Returns scalar: any ray enters
    before `upper` (its per-ray running closest hit)."""
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    ix = rays_ref[:, 12:13]
    iy = rays_ref[:, 13:14]
    iz = rays_ref[:, 14:15]
    tmin = rays_ref[:, 10:11]
    base = jc * 8
    lox = (cb_ref[base + 0] - ox) * ix
    hix = (cb_ref[base + 3] - ox) * ix
    loy = (cb_ref[base + 1] - oy) * iy
    hiy = (cb_ref[base + 4] - oy) * iy
    loz = (cb_ref[base + 2] - oz) * iz
    hiz = (cb_ref[base + 5] - oz) * iz
    tenter = jnp.maximum(
        jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
        jnp.maximum(jnp.minimum(loz, hiz), tmin),
    )
    texit = jnp.minimum(
        jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
        jnp.minimum(jnp.maximum(loz, hiz), upper),
    )
    return jnp.any(tenter <= texit)


def _closest_kernel(sched_ref, cb_ref, rays_ref, coef_ref,
                    t_out, idx_out, uv_out, *, nc: int, c: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r = rays_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        t_out[:] = jnp.full((r, 1), BIG_T, jnp.float32)
        idx_out[:] = jnp.full((r, 1), -1, jnp.int32)
        uv_out[:] = jnp.zeros((r, 2), jnp.float32)

    jc = sched_ref[i * nc + j]

    @pl.when(jc >= 0)
    def _test():
        # tight per-ray cull incl. early-out against the running best
        # (clusters arrive front-to-back, so this skips occluded ones)
        best_t = t_out[:]
        tmax = rays_ref[:, 11:12]
        any_live = _ray_slab(rays_ref, cb_ref, jc,
                             jnp.minimum(tmax, best_t))

        @pl.when(any_live)
        def _body():
            f = rays_ref[:]                               # [R,16]
            tmin = rays_ref[:, 10:11]
            t, inv_det, u_num, v_num, ok, _ = _mt_from_matmul(
                f, coef_ref, jc, tmin, tmax, c)
            t = jnp.where(ok, t, BIG_T)
            lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
            bt = jnp.min(t, axis=1, keepdims=True)
            sel = (t <= bt) & (t < BIG_T)
            li = jnp.min(jnp.where(sel, lane, c), axis=1,
                         keepdims=True)
            picked = li < c
            li_c = jnp.minimum(li, c - 1)
            onehot = lane == li_c
            pick = lambda a: jnp.sum(
                jnp.where(onehot, a, 0.0), axis=1, keepdims=True)
            better = picked & (bt < best_t)
            gi = jc * c + li_c
            t_out[:] = jnp.where(better, bt, best_t)
            idx_out[:] = jnp.where(better, gi, idx_out[:])
            uvw = pick(u_num * inv_det)
            vvw = pick(v_num * inv_det)
            uv_out[:] = jnp.where(
                better, jnp.concatenate([uvw, vvw], axis=1), uv_out[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call(rays, coef, clusters, interpret: bool):
    n_pad = rays.shape[0]
    nb = n_pad // RAY_BLOCK
    nc = clusters.shape[0]
    c = coef.shape[1] // (4 * nc)
    sched = cluster_schedule(rays, clusters)
    cb_flat = clusters.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, nc),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 16), lambda i, j, s, cb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, coef.shape[1]), lambda i, j, s, cb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j, s, cb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j, s, cb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 2), lambda i, j, s, cb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_closest_kernel, nc=nc, c=c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        ],
        interpret=interpret,
    )(sched, cb_flat, rays, coef)


def intersect_pallas(scene, ro, rd, t_min, t_max) -> Hit:
    """Closest-hit via the block-sparse MXU cluster kernel."""
    rays, n = pack_rays16(ro, rd, t_min, t_max)
    coef, _aux, clusters = scene_pack(scene)
    t, idx, uv = _closest_call(rays, coef, clusters, _interpret())
    return Hit(t=t[:n, 0], tri=idx[:n, 0], u=uv[:n, 0], v=uv[:n, 1])


# ---------------------------------------------------------------- occlusion
def _occlusion_kernel(sched_ref, cb_ref, rays_ref, coef_ref, aux_ref,
                      att_out, *, nc: int, c: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r = rays_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        att_out[:] = jnp.ones((r, 4), jnp.float32)

    jc = sched_ref[i * nc + j]

    @pl.when(jc >= 0)
    def _test():
        # any-hit early-out: skip once every ray is fully occluded
        prev = att_out[:]
        unoccluded = (prev[:, 0:1] + prev[:, 1:2] + prev[:, 2:3]) > 0.0
        tmax = rays_ref[:, 11:12]
        upper = jnp.where(unoccluded, tmax, jnp.float32(-BIG_T))
        any_live = _ray_slab(rays_ref, cb_ref, jc, upper)

        @pl.when(any_live)
        def _body():
            _occlusion_cluster(rays_ref, coef_ref, aux_ref, att_out, jc, c)


def _occlusion_cluster(rays_ref, coef_ref, aux_ref, att_out, j, c: int):
    r = rays_ref.shape[0]
    f = rays_ref[:]
    tmin = rays_ref[:, 10:11]
    tmax = rays_ref[:, 11:12]
    t, inv_det, u_num, v_num, hit, det = _mt_from_matmul(
        f, coef_ref, j, tmin, tmax, c)
    if True:
        sl = pl.ds(pl.multiple_of(j * c, c), c)
        transp = aux_ref[0:1, sl]
        sar = aux_ref[1:2, sl]
        sag = aux_ref[2:3, sl]
        sab = aux_ref[3:4, sl]
        inv_n = aux_ref[4:5, sl]
        # |cos(n, d)| = |det| / |n|  (d is unit length)
        ndi = jnp.abs(det) * inv_n
        c1 = jnp.clip(1.0 - ndi, 0.0, 1.0)
        c5 = c1 * c1
        c5 = c5 * c5 * c1
        # refraction.cu:144-153 transparent-shadow fresnel; opaque -> 0
        fr = lambda sa: jnp.clip(1.0 - ((1.0 - sa) + sa * c5), 0.0, 1.0)
        factor = lambda sa: jnp.where(
            hit, jnp.where(transp > 0.0, fr(sa), 0.0), 1.0
        )

        def lane_prod(x):
            # exact lane-axis product via log2(c) pairwise folds
            # (jnp.prod reductions don't lower natively on Mosaic)
            width = c
            while width > 1:
                half = width // 2
                x = x[:, :half] * x[:, half:width]
                width = half
            return x

        prev = att_out[:]
        upd = jnp.concatenate(
            [lane_prod(factor(sar)), lane_prod(factor(sag)),
             lane_prod(factor(sab)), jnp.ones((r, 1), jnp.float32)],
            axis=1,
        )
        att_out[:] = prev * upd


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occlusion_call(rays, coef, aux, clusters, interpret: bool):
    n_pad = rays.shape[0]
    nb = n_pad // RAY_BLOCK
    nc = clusters.shape[0]
    c = coef.shape[1] // (4 * nc)
    sched = cluster_schedule(rays, clusters)
    cb_flat = clusters.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, nc),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 16), lambda i, j, s, cb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, coef.shape[1]), lambda i, j, s, cb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, aux.shape[1]), lambda i, j, s, cb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 4), lambda i, j, s, cb: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_occlusion_kernel, nc=nc, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
    )(sched, cb_flat, rays, coef, aux)


def occlusion_pallas(scene, ro, rd, t_min, t_max) -> jnp.ndarray:
    rays, n = pack_rays16(ro, rd, t_min, t_max)
    coef, aux, clusters = scene_pack(scene)
    att = _occlusion_call(rays, coef, aux, clusters, _interpret())
    return att[:n, :3]


# -------------------------------------------------- ray-coherence swizzle
def tile_swizzle_indices(height: int, width: int, tile: int = 16) -> np.ndarray:
    """Permutation mapping tile-major order -> scanline order.

    Packing rays in 2D-tile order makes each RAY_BLOCK a compact screen
    tile (tight frustum), so the slab test culls far more clusters than
    scanline strips do. Returns idx with: flat_tiled[i] = flat_scan[idx[i]].
    """
    assert height % tile == 0 and width % tile == 0
    yy, xx = np.mgrid[0:height, 0:width]
    flat = (yy * width + xx).reshape(
        height // tile, tile, width // tile, tile
    )
    return flat.transpose(0, 2, 1, 3).reshape(-1).astype(np.int32)
