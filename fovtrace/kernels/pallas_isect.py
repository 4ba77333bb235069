"""Pallas TPU ray/triangle intersection — the hot kernel.

TPU-native replacement for OptiX `rtTrace` + Trbvh traversal
(`REF/PathTracer.cpp:641`, `REF/cuda/triangle_mesh.cu:59-106`). There are
no RT cores and no efficient pointer-chasing on TPU, so the design maps
the problem onto the MXU + VPU instead:

  clustering  triangles are sorted into CLUSTERS of 128 (contiguous
              blocks in BVH leaf order -> spatially coherent) with
              precomputed AABBs; every shape is static.
  culling     per 256-ray block, an interval-arithmetic bundle-vs-AABB
              test (XLA side) builds a front-to-back schedule of LIVE
              clusters; the kernel loops over exactly that many clusters
              (a `while_loop`, not a grid axis — dead pairs cost zero)
              and breaks early once the conservative cluster entry-t
              exceeds every ray's running best hit.
  MXU         Moller-Trumbore is reformulated as determinants linear in
              the 10-dim ray feature f = [o, d, o x d, 1] (Cramer /
              Plucker form):
                  det   = f . [0,   -n,      0,  0      ]
                  t*det = f . [n,    0,      0,  -v0.n  ]
                  u*det = f . [0,  v0 x e2,  e2, 0      ]
                  v*det = f . [0,  e1 x v0, -e1, 0      ]
              so one [256,16] x [16, 4*128] matmul per live cluster
              produces all four quantities for 128 triangles — the FLOPs
              ride the systolic array instead of the VPU, leaving only a
              ~12-op elementwise epilogue (divide, compares, argmin).

The matmul runs as an error-compensated bf16 SPLIT by default
(`MATMUL_MODE = "bf16x3"`): x = hi + lo in bf16, res = hi@Chi + hi@Clo +
lo@Chi — 3 MXU passes with ~2^-16 relative error, vs 6 passes for
Mosaic's f32-HIGHEST (2x faster, same winner ids on all test scenes) and
1 pass for raw bf16 (3x faster still, but its 2^-8 error visibly flips
hits to misses along quad diagonals — cracks). The kernel only has to
get the winning triangle ID right: `intersect.refine_hit` recomputes
(t,u,v) for that triangle in f32, differentiably (the kernel runs under
stop_gradient; SURVEY.md §7 hard part #3).
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

# Cramer-matmul precision: "bf16x3" (3-pass compensated split, ~f32
# accurate, the default), "bf16" (1 pass, fastest, cracks along quad
# diagonals), "f32" (Mosaic HIGHEST, 6 passes, exact).
MATMUL_MODE = "bf16x3"

_DN = dict(dimension_numbers=(((1,), (0,)), ((), ())),
           preferred_element_type=jnp.float32)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _ray_parts(fr):
    """Per-block hoisted matmul operands for the current MATMUL_MODE."""
    if MATMUL_MODE == "f32":
        return (fr,)
    if MATMUL_MODE == "bf16":
        return (fr.astype(jnp.bfloat16),)
    return _split_bf16(fr)


def _mt_matmul(parts, cb):
    """[R,16] x [16,4c] under the selected precision mode; f32 result."""
    if MATMUL_MODE == "f32":
        return jax.lax.dot_general(
            parts[0], cb, precision=jax.lax.Precision.HIGHEST, **_DN)
    if MATMUL_MODE == "bf16":
        return jax.lax.dot_general(parts[0], cb.astype(jnp.bfloat16), **_DN)
    fhi, flo = parts
    chi, clo = _split_bf16(cb)
    return (
        jax.lax.dot_general(fhi, chi, **_DN)
        + jax.lax.dot_general(fhi, clo, **_DN)
        + jax.lax.dot_general(flo, chi, **_DN)
    )


def pick_cluster(t_pad_min: int) -> int:
    """Cluster width for a scene of ~t triangles: smallest power-of-two
    multiple of CLUSTER keeping the cluster count <= MAX_CLUSTERS (the
    flat per-block schedule must fit scalar memory). Large scenes get
    coarser clusters; a supercluster hierarchy is the planned upgrade."""
    c = CLUSTER
    while (t_pad_min + c - 1) // c > MAX_CLUSTERS:
        c *= 2
    return c


def _interpret() -> bool:
    """Pallas kernels interpret on CPU (tests / dryrun) and compile on TPU."""
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------- packing
def compute_pack(scene):
    """(coef [NC, 16, 4c], aux [NC, 8, c], clusters [NC, 8]).

    coef column layout per cluster: [t_num | det | u_num | v_num], each c
    wide. The cluster axis LEADS so the kernel selects a cluster with a
    plain dynamic index on a non-tiled dim (free address arithmetic) —
    dynamic slicing along the lane dim is what Mosaic charges for.
    Padding triangles have all-zero coefficients -> det = 0 -> never hit.
    aux rows: transparent, shadow_att rgb, 1/|e1 x e2| (for
    |cos| = |det|/|n| in the occlusion fresnel).
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
        .transpose(1, 0, 3, 2)                  # [NC, 16, 4, c]
        .reshape(nc, 16, 4 * c)
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
    aux = aux.reshape(8, nc, c).transpose(1, 0, 2)   # [NC, 8, c]

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
    result drives the kernel's per-block live-cluster schedule.
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


def cluster_schedule(rays: jnp.ndarray, clusters: jnp.ndarray):
    """(sched [NB*NC+1] i32, counts [NB] i32).

    Per ray block: live clusters sorted FRONT-TO-BACK by conservative
    entry-t, dead clusters compacted to the tail. `counts[i]` bounds the
    kernel's inner while_loop, so dead (block, cluster) pairs cost
    NOTHING.

    Each entry packs (tenter, cluster id) into ONE i32 — SMEM is the
    scarce resource (~1MB) and two separate arrays overflow it at 1080p:
      enc = (quantized_tenter << 8) | jc
    so the kernel can BREAK once the next cluster starts beyond every
    ray's running best hit (front-to-back order makes the first such
    cluster final). The quantization floors tenter (conservative: never
    skips a cluster that could hold a closer hit). Requires NC <= 256
    (MAX_CLUSTERS enforces far less). Returns a third element, params
    [2] f32 = (key scale, t_cap), prefetched so the kernel can convert
    its f32 bound into key space. +1 trailing pad: the loop's exit check
    reads index i*NC+count. 1-D because SMEM pads the last axis of 2-D
    scalar arrays to 128 lanes.
    """
    live, tenter = block_liveness(rays, clusters)
    key = jnp.where(live, tenter, jnp.float32(BIG_T))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)      # [NB, NC]
    tent_sorted = jnp.take_along_axis(key, order, axis=1)

    # quantized tenter key (Mosaic has no scalar f32<->i32 bitcast):
    # scale maps [0, t_cap] onto [0, 2^23); floor() makes the stored key
    # a LOWER bound of the true tenter, the kernel adds +2 on the bound
    # side to absorb its own f32 rounding — so a break strictly implies
    # tenter > bound.
    nonempty = jnp.all(clusters[:, 0:3] <= clusters[:, 3:6], axis=-1)
    big = jnp.float32(BIG_T)
    glo = jnp.min(jnp.where(nonempty[:, None], clusters[:, 0:3], big), axis=0)
    ghi = jnp.max(jnp.where(nonempty[:, None], clusters[:, 3:6], -big), axis=0)
    t_cap = 2.0 * jnp.linalg.norm(jnp.maximum(ghi - glo, 0.0)) + 1.0
    scale = (jnp.float32(_KEY_MAX) - 4.0) / t_cap
    tkey = jnp.clip(jnp.clip(tent_sorted, 0.0, t_cap) * scale,
                    0.0, float(_KEY_MAX)).astype(jnp.int32)
    enc = tkey * 256 + order                               # (key<<8) | jc
    counts = jnp.sum(live, axis=1).astype(jnp.int32)
    sched = jnp.concatenate([enc.reshape(-1),
                             jnp.full((1,), _KEY_MAX * 256, jnp.int32)])
    return sched, counts, jnp.stack([scale, t_cap])


def _mt_epilogue(res, tmin, tmax, c: int):
    """Shared hit test on the matmul result [R, 4c] ->
    (t [R,c] masked with BIG_T on miss, hit [R,c], det [R,c])."""
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
    return jnp.where(ok, t, BIG_T), ok, det


# ------------------------------------------------------------ closest hit
_KEY_MAX = (1 << 23) - 1


def _bound_key(bound_f32, scale, t_cap):
    """f32 bound -> quantized i32 key, +2 so rounding in this f32 mul can
    never make the kernel break while the true tenter <= bound. Negative
    bounds (dead blocks use tmax = -1) clamp to key 2, below every live
    tenter key+2... and end the loop after at most a couple of no-hit
    iterations."""
    q = jnp.clip(bound_f32, 0.0, t_cap) * scale
    return q.astype(jnp.int32) + 2


def _closest_kernel(counts_ref, sched_ref, params_ref, rays_ref, coef_ref,
                    t_out, idx_out, *, nc: int, c: int):
    i = pl.program_id(0)
    r = rays_ref.shape[0]

    t_out[:] = jnp.full((r, 1), BIG_T, jnp.float32)
    idx_out[:] = jnp.full((r, 1), -1, jnp.int32)

    # hoisted per-block invariants
    parts = _ray_parts(rays_ref[:])                 # one convert per block
    tmin = rays_ref[:, 10:11]
    tmax = rays_ref[:, 11:12]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    count = counts_ref[i]
    scale = params_ref[0]
    t_cap = params_ref[1]
    tmax_blk = jnp.max(rays_ref[:, 11])             # scalar upper bound

    def cond(carry):
        l, bound_key = carry
        # front-to-back: once a cluster starts beyond every ray's best
        # hit (or every tmax), no later cluster can improve anything
        tent_key = sched_ref[i * nc + l] // 256
        return (l < count) & (tent_key <= bound_key)

    def body(carry):
        l, bound_key = carry
        jc = sched_ref[i * nc + l] % 256
        res = _mt_matmul(parts, coef_ref[jc])
        t, _, _ = _mt_epilogue(res, tmin, tmax, c)
        best_t = t_out[:]
        bt = jnp.min(t, axis=1, keepdims=True)
        sel = (t <= bt) & (t < BIG_T)
        li = jnp.min(jnp.where(sel, lane, c), axis=1, keepdims=True)
        better = (li < c) & (bt < best_t)
        gi = jc * c + jnp.minimum(li, c - 1)
        t_out[:] = jnp.where(better, bt, best_t)
        idx_out[:] = jnp.where(better, gi, idx_out[:])
        new_bound = jnp.minimum(jnp.max(t_out[:]), tmax_blk)
        return l + 1, _bound_key(new_bound, scale, t_cap)

    jax.lax.while_loop(cond, body,
                       (0, _bound_key(tmax_blk, scale, t_cap)))


# blocks per pallas_call chunk so the prefetched schedule fits SMEM
# (~1MB): entries*4B <= ~740KB (1080p at RAY_BLOCK=256 -> 180,225
# entries, verified to compile; two such arrays do not)
_SMEM_SCHED_ENTRIES = 185_000


def _block_chunks(nb: int, nc: int):
    """Split nb ray blocks into chunks whose [chunk*nc] schedule fits
    SMEM. Returns the chunk size in blocks."""
    per = max(1, _SMEM_SCHED_ENTRIES // max(nc, 1))
    return min(nb, per)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call(rays, coef, clusters, interpret: bool):
    sched, counts, params = cluster_schedule(rays, clusters)
    return _closest_call_pre(rays, coef, sched, counts, params, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call_pre(rays, coef, sched, counts, params, interpret: bool):
    n_pad = rays.shape[0]
    nb = n_pad // RAY_BLOCK
    nc = coef.shape[0]
    c = coef.shape[2] // 4

    cb = _block_chunks(nb, nc)
    if cb < nb:
        # chunk along ray blocks; schedules are per-block so slices are
        # self-contained (re-pad each chunk's sched with the +1 sentinel)
        outs = []
        sent = jnp.full((1,), _KEY_MAX * 256, jnp.int32)
        for b0 in range(0, nb, cb):
            b1 = min(b0 + cb, nb)
            outs.append(_closest_call_pre(
                rays[b0 * RAY_BLOCK:b1 * RAY_BLOCK], coef,
                jnp.concatenate([sched[b0 * nc:b1 * nc], sent]),
                counts[b0:b1], params, interpret))
        return [jnp.concatenate([o[k] for o in outs]) for k in range(2)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 16), lambda i, n, s, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, 16, 4 * c), lambda i, n, s, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, n, s, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, n, s, p: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_closest_kernel, nc=nc, c=c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(counts, sched, params, rays, coef)


def intersect_pallas(scene, ro, rd, t_min, t_max) -> Hit:
    """Closest-hit via the block-sparse MXU cluster kernel.

    Returns only (t, tri) from the kernel; (u, v) are zeros — callers go
    through `intersect.refine_hit`, which recomputes t/u/v for the
    winning triangle in f32 (and differentiably)."""
    rays, n = pack_rays16(ro, rd, t_min, t_max)
    coef, _aux, clusters = scene_pack(scene)
    t, idx = _closest_call(rays, coef, clusters, _interpret())
    z = jnp.zeros((n,), jnp.float32)
    return Hit(t=t[:n, 0], tri=idx[:n, 0], u=z, v=z)


# ---------------------------------------------------------------- occlusion
def _occlusion_kernel(counts_ref, sched_ref, params_ref, rays_ref, coef_ref,
                      aux_ref, att_out, *, nc: int, c: int):
    i = pl.program_id(0)
    r = rays_ref.shape[0]

    att_out[:] = jnp.ones((r, 4), jnp.float32)

    parts = _ray_parts(rays_ref[:])
    tmin = rays_ref[:, 10:11]
    tmax = rays_ref[:, 11:12]
    count = counts_ref[i]
    tmax_key = _bound_key(jnp.max(rays_ref[:, 11]),
                          params_ref[0], params_ref[1])

    def cond(carry):
        l, live = carry
        tent_key = sched_ref[i * nc + l] // 256
        return (l < count) & live & (tent_key <= tmax_key)

    def body(carry):
        l, live = carry
        jc = sched_ref[i * nc + l] % 256
        res = _mt_matmul(parts, coef_ref[jc])
        t, hit, det = _mt_epilogue(res, tmin, tmax, c)

        transp = aux_ref[jc, 0:1, :]
        sar = aux_ref[jc, 1:2, :]
        sag = aux_ref[jc, 2:3, :]
        sab = aux_ref[jc, 3:4, :]
        inv_n = aux_ref[jc, 4:5, :]
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
        new = prev * upd
        att_out[:] = new
        # any-hit early-out: stop once every ray is fully occluded
        live2 = jnp.max(new[:, 0:1] + new[:, 1:2] + new[:, 2:3]) > 0.0
        return l + 1, live2

    jax.lax.while_loop(cond, body, (0, jnp.bool_(True)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occlusion_call(rays, coef, aux, clusters, interpret: bool):
    sched, counts, params = cluster_schedule(rays, clusters)
    return _occlusion_call_pre(rays, coef, aux, sched, counts, params,
                               interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occlusion_call_pre(rays, coef, aux, sched, counts, params,
                        interpret: bool):
    n_pad = rays.shape[0]
    nb = n_pad // RAY_BLOCK
    nc = coef.shape[0]
    c = coef.shape[2] // 4

    cb = _block_chunks(nb, nc)
    if cb < nb:
        outs = []
        sent = jnp.full((1,), _KEY_MAX * 256, jnp.int32)
        for b0 in range(0, nb, cb):
            b1 = min(b0 + cb, nb)
            outs.append(_occlusion_call_pre(
                rays[b0 * RAY_BLOCK:b1 * RAY_BLOCK], coef, aux,
                jnp.concatenate([sched[b0 * nc:b1 * nc], sent]),
                counts[b0:b1], params, interpret))
        return jnp.concatenate(outs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 16), lambda i, n, s, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, 16, 4 * c), lambda i, n, s, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, 8, c), lambda i, n, s, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 4), lambda i, n, s, p: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_occlusion_kernel, nc=nc, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
    )(counts, sched, params, rays, coef, aux)


def occlusion_pallas(scene, ro, rd, t_min, t_max) -> jnp.ndarray:
    rays, n = pack_rays16(ro, rd, t_min, t_max)
    coef, aux, clusters = scene_pack(scene)
    att = _occlusion_call(rays, coef, aux, clusters, _interpret())
    return att[:n, :3]


# -------------------------------------------------- ray-coherence swizzle
def tile_swizzle_indices(height: int, width: int, tile: int = 16) -> np.ndarray:
    """Permutation mapping tile-major order -> scanline order.

    Packing rays in 2D-tile order makes each RAY_BLOCK a compact screen
    tile (tight frustum), so the bundle liveness test culls far more
    clusters than scanline strips do. Returns idx with:
    flat_tiled[i] = flat_scan[idx[i]].
    """
    assert height % tile == 0 and width % tile == 0
    yy, xx = np.mgrid[0:height, 0:width]
    flat = (yy * width + xx).reshape(
        height // tile, tile, width // tile, tile
    )
    return flat.transpose(0, 2, 1, 3).reshape(-1).astype(np.int32)
