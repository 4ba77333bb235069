"""Pallas TPU ray/triangle intersection — the hot kernel.

TPU-native replacement for OptiX `rtTrace` + Trbvh traversal
(`REF/PathTracer.cpp:641`, `REF/cuda/triangle_mesh.cu:59-106`). There are
no RT cores and no efficient pointer-chasing on TPU, so the design maps
the problem onto the MXU + VPU instead:

  clustering  triangles are sorted into CLUSTERS of 128 (contiguous
              blocks in BVH leaf order -> spatially coherent) with
              precomputed AABBs; every shape is static. Clusters are
              grouped into SUPERCLUSTERS of M (a power of two, chosen so
              there are <= 256 superclusters) — the two-level analog of
              the reference's Group/GeometryGroup hierarchy
              (PathTracer.cpp:634-674): scheduling happens at the
              supercluster level, culling stays exact per cluster via a
              member bitmask.
  culling     per 256-ray block, an interval-arithmetic bundle-vs-AABB
              test (XLA side) builds a front-to-back schedule of LIVE
              superclusters; the kernel loops over exactly that many
              (a `while_loop`, not a grid axis — dead pairs cost zero),
              skips dead member clusters by bitmask, and breaks early
              once the conservative supercluster entry-t exceeds every
              ray's running best hit.
  MXU         Moller-Trumbore is reformulated as determinants linear in
              the 10-dim ray feature f = [o, d, o x d, 1] (Cramer /
              Plucker form):
                  det   = f . [0,   -n,      0,  0      ]
                  t*det = f . [n,    0,      0,  -v0.n  ]
                  u*det = f . [0,  v0 x e2,  e2, 0      ]
                  v*det = f . [0,  e1 x v0, -e1, 0      ]
              so one [16, 4*128]^T x [16, 256] matmul per live cluster
              produces all four quantities for 128 triangles — the FLOPs
              ride the systolic array instead of the VPU, leaving only a
              ~12-op elementwise epilogue (divide, compares, argmin).

DATA LAYOUT (round 3): everything the kernel touches in HBM is stored
TRIANGLE/RAY-MAJOR on the 128-lane axis — rays as [NB, 16, 256] (not
[N, 16], whose 16-wide minor axis pads to 128 lanes = 8x HBM traffic),
outputs as (GROUP=8, 256) blocks (not [N, 1], which pads 128x). In the
kernel each sub-block transposes its [16,R] ray tile ONCE to [R,16] so
the per-cluster matmul stays in the MXU's canonical orientation — only
the HBM layout changed vs the flat round-2 kernel. Ray origins /
directions arrive as SoA `Vec3` ([N] per component) — fovtrace.core.vec.

SCHEDULE PLUMBING (round 5): the per-block schedule lives in HBM and
each sub-block DMAs its row into an SMEM scratch — round 4 prefetched
the whole schedule into SMEM, which (a) capped it at ~185k entries and
forced the ray stream into per-chunk pallas_calls, and (b) capped the
packed cluster id at 8 bits (MAX 256 clusters -> clusters coarsened to
1024 triangles at 262k tris and culling collapsed, BENCH_CITY 2.8x
slower per ray). Entries now pack (15-bit quantized tenter << 16 |
16-bit supercluster id); a parallel row carries the per-member liveness
bitmask. The 8 sub-blocks run in ONE lax.fori_loop (round 4 unrolled
them in Python — 8x the Mosaic code, a measured 4.5x compile-time
regression at 1080p).

The matmul runs as an error-compensated bf16 SPLIT by default
(`MATMUL_MODE = "bf16x3"`): x = hi + lo in bf16, res = Chi@hi + Clo@hi +
Chi@lo — 3 MXU passes with ~2^-16 relative error, vs 6 passes for
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

from fovtrace.core import vec
from fovtrace.core.vec import Vec3
from fovtrace.kernels.intersect import BIG_T, DET_EPS, Hit

CLUSTER = 128       # minimum triangles per cluster (lane width)
MAX_CLUSTERS = 4096  # cap on clusters/scene: the schedule id field is 16
#                      bits and the member bitmask 32, so clusters stay
#                      128-wide up to 512k triangles (beyond that
#                      pick_cluster coarsens). Packs above the VMEM
#                      budget stream their coefficients from HBM with
#                      double-buffered DMA (_closest_kernel_stream).
MAX_SCHED = 1024    # cap on SCHEDULED entries (superclusters) per block:
#                      bounds the XLA-side O(NSC^2) rank sort (~7 G ops
#                      at 1080p x NSC=666 — a few ms, paid only by big
#                      scenes and repaid by 4x finer schedule/member
#                      granularity: city M drops 8 -> 2)
RAY_BLOCK = 256     # rays per schedule bundle (culling granularity)
GROUP = 8           # ray blocks per pallas program: the output block is
#                     then (GROUP, RAY_BLOCK) = (8, 256) — the minimal
#                     legal dense VMEM tile (sublane dim must divide 8);
#                     one lax.fori_loop runs the GROUP sub-blocks

# Cramer-matmul precision: "bf16x3" (3-pass compensated split, ~f32
# accurate, the default), "bf16" (1 pass, fastest, cracks along quad
# diagonals), "f32" (Mosaic HIGHEST, 6 passes, exact).
MATMUL_MODE = "bf16x3"

# canonical MXU orientation: rays [R,16] x coef [16,4c] -> [R,4c]
# (the transposed (0,0)-contracting form forces a per-iteration operand
# relayout in Mosaic — measured 197ms vs 120ms at 2.1M rays)
_DN = dict(dimension_numbers=(((1,), (0,)), ((), ())),
           preferred_element_type=jnp.float32)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _ray_parts(fr):
    """Per-block hoisted matmul operand for the current MATMUL_MODE.
    fr: [R, 16]. For the default compensated-bf16 mode the three split
    terms ride ONE K=48 operand [fhi | flo | fhi] so the whole product
    is a single MXU pass (see _pack_coef)."""
    if MATMUL_MODE == "f32":
        return (fr,)
    if MATMUL_MODE == "bf16":
        return (fr.astype(jnp.bfloat16),)
    fhi, flo = _split_bf16(fr)
    return (jnp.concatenate([fhi, flo, fhi], axis=1),)     # [R, 48]


def _pack_coef(coef):
    """XLA-side coefficient transform for the kernel's matmul mode.

    bf16x3: [NC, 16, 4c] f32 -> [NC, 48, 4c] bf16 stacked [chi; chi;
    clo], so  [fhi|flo|fhi] @ [chi;chi;clo] = fhi@chi + flo@chi +
    fhi@clo  — the error-compensated split as ONE K=48 matmul (f32
    accumulation on the MXU) instead of three K=16 passes at 12.5%
    systolic-row utilization."""
    if MATMUL_MODE == "f32":
        return coef
    if MATMUL_MODE == "bf16":
        return coef.astype(jnp.bfloat16)
    chi = coef.astype(jnp.bfloat16)
    clo = (coef - chi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([chi, chi, clo], axis=1)        # [NC, 48, 4c]


def _mt_matmul(parts, cb):
    """rays [R,K] x packed coef [K,4c] -> f32 [R, 4c]."""
    if MATMUL_MODE == "f32":
        return jax.lax.dot_general(
            parts[0], cb, precision=jax.lax.Precision.HIGHEST, **_DN)
    return jax.lax.dot_general(parts[0], cb, **_DN)


def pick_cluster(t_pad_min: int) -> int:
    """Cluster width for a scene of ~t triangles: smallest power-of-two
    multiple of CLUSTER keeping the cluster count <= MAX_CLUSTERS.
    128-wide clusters up to 512k triangles; beyond that clusters coarsen
    (256-wide at 1M)."""
    c = CLUSTER
    while (t_pad_min + c - 1) // c > MAX_CLUSTERS:
        c *= 2
    return c


def pick_members(nc: int) -> int:
    """Member clusters per supercluster: smallest power of two keeping
    the scheduled-entry count <= MAX_SCHED. 1 for scenes up to 32k tris
    (the schedule degenerates to round 4's flat per-cluster form)."""
    m = 1
    while (nc + m - 1) // m > MAX_SCHED:
        m *= 2
    assert m <= 32, "member bitmask holds 32 bits"
    return m


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
    NC is padded to a multiple of the supercluster member count M (see
    pick_members) so supercluster rows are contiguous [M, 16, 4c] HBM
    slabs. Padding triangles have all-zero coefficients -> det = 0 ->
    never hit; padding clusters have empty AABBs -> never live.
    aux rows (triangles ride the lane axis, matching the occlusion
    epilogue's [R,c] hit masks): transparent, shadow_att rgb,
    1/|e1 x e2| (for |cos| = |det|/|n| in the occlusion fresnel).
    """
    from fovtrace.scene.scene import MATL_REFRACTION

    v0, e1, e2 = scene.v0, scene.e1, scene.e2
    t = v0.shape[0]
    c = pick_cluster(t)
    m = pick_members((t + c - 1) // c)
    unit = c * m
    pad = (-t) % unit
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


def pack_raysT(ro: Vec3, rd: Vec3, t_min, t_max) -> Tuple[jnp.ndarray, int]:
    """SoA rays -> [NB, 16, RAY_BLOCK] transposed feature blocks:
    rows = o(3), d(3), w = o x d (3), 1, t_min, t_max, 1/d (3), 0.

    Rows 0-9 are the matmul feature vector (coef rows 10-15 are zero,
    so the trailing slab-test rows don't pollute the contraction).
    Built as a [16, N] stack (sublane-major: N rides the dense lane
    axis) then reshaped/transposed to blocks — never materializes a
    lane-padded [N, 16]."""
    n = ro.x.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    w = vec.cross(ro, rd)
    eps = jnp.float32(1e-12)
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < eps,
                                    jnp.where(d < 0, -eps, eps), d)
    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    raysT = jnp.stack(
        [ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, w.x, w.y, w.z, ones,
         t_min, t_max, inv(rd.x), inv(rd.y), inv(rd.z), zeros],
        axis=0,
    )                                                  # [16, N]
    # pad to GROUP whole ray blocks (dead filler blocks have zero live
    # clusters -> their while_loops exit immediately)
    pad = (-n) % (RAY_BLOCK * GROUP)
    if pad:
        # padding rays: d=(1,0,0), t_max=-1 -> never hit
        filler = jnp.zeros((16, pad), jnp.float32)
        filler = filler.at[3].set(1.0).at[11].set(-1.0)
        filler = filler.at[12:15].set(1.0)
        raysT = jnp.concatenate([raysT, filler], axis=1)
    n_pad = raysT.shape[1]
    nb = n_pad // RAY_BLOCK
    raysT = raysT.reshape(16, nb, RAY_BLOCK).transpose(1, 0, 2)
    return raysT, n


def pack_rays16(ro, rd, t_min, t_max) -> Tuple[jnp.ndarray, int]:
    """Row-API compatibility: [N,3] rays -> transposed blocks."""
    return pack_raysT(vec.from_rows(ro), vec.from_rows(rd), t_min, t_max)


# --------------------------------------------------- block-sparse liveness
def block_liveness(raysT: jnp.ndarray, clusters: jnp.ndarray) -> jnp.ndarray:
    """Conservative [NB, NC] bool: can ANY ray of block i hit cluster j?

    Interval-arithmetic ray-bundle vs AABB slab test: per component, the
    bundle's entry-t lower bound is the min over the four (origin
    extreme / direction extreme) division corners, the exit-t upper
    bound the max; a direction interval straddling zero gives an
    unbounded component (no constraint). If max_k(entry lower bound) >
    min_k(exit upper bound), NO ray in the bundle can hit — a valid
    conservative cull. Computed densely in XLA (NB*NC is tiny); the
    result drives the kernel's per-block live-supercluster schedule.

    raysT: [NB, 16, RAY_BLOCK] packed transposed blocks.
    """
    o_lo = jnp.min(raysT[:, 0:3, :], axis=2)   # [NB,3]
    o_hi = jnp.max(raysT[:, 0:3, :], axis=2)
    d_lo = jnp.min(raysT[:, 3:6, :], axis=2)
    d_hi = jnp.max(raysT[:, 3:6, :], axis=2)
    tmin_lo = jnp.min(raysT[:, 10, :], axis=1)          # [NB]
    tmax_hi = jnp.max(raysT[:, 11, :], axis=1)

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


_KEY_MAX = (1 << 15) - 1


def cluster_schedule(raysT: jnp.ndarray, clusters: jnp.ndarray):
    """(schedmask [NB, 2*SW] i32, counts [NB] i32, params [2] f32).

    Per ray block: live SUPERCLUSTERS (groups of M clusters, M =
    pick_members) sorted FRONT-TO-BACK by conservative entry-t, dead
    ones compacted to the tail. `counts[i]` bounds the kernel's inner
    while_loop, so dead (block, supercluster) pairs cost NOTHING.

    Row layout (SW = NSC+1 rounded up to 128 lanes, the HBM-slice
    alignment for the kernel's per-block DMA):
      [0:SW)     enc = (quantized_tenter << 16) | supercluster_id,
                 sorted ascending — enc is itself the comparison key
                 (tenter first, id tiebreak, dead keys max), so each
                 entry's position is its RANK = #smaller keys, an
                 O(NSC^2) fully-vectorized comparison matrix (XLA's
                 variadic sort is serial-ish on TPU; NSC <= 256 keeps
                 NB*NSC^2 trivial VPU work).
      [SW:2*SW)  per-member liveness bitmask (bit m = cluster
                 sc*M + m can be hit), permuted identically.

    The kernel BREAKS once the next supercluster starts beyond every
    ray's running best hit — front-to-back order makes the first such
    entry final; member tenters are >= their supercluster's, so the
    supercluster-granularity break stays exact. The 15-bit quantization
    floors tenter (conservative: never skips a cluster that could hold
    a closer hit). params [2] f32 = (key scale, t_cap), prefetched so
    the kernel can convert its f32 bound into key space.
    """
    live, tenter = block_liveness(raysT, clusters)
    nb = live.shape[0]
    nc = clusters.shape[0]
    m = pick_members(nc)
    assert nc % m == 0, "compute_pack pads NC to a multiple of M"
    nsc = nc // m

    # quantized tenter key (Mosaic has no scalar f32<->i32 bitcast):
    # scale maps [0, t_cap] onto [0, 2^15); floor() makes the stored key
    # a LOWER bound of the true tenter, the kernel adds +2 on the bound
    # side to absorb its own f32 rounding — so a break strictly implies
    # tenter > bound.
    nonempty = jnp.all(clusters[:, 0:3] <= clusters[:, 3:6], axis=-1)
    big = jnp.float32(BIG_T)
    glo = jnp.min(jnp.where(nonempty[:, None], clusters[:, 0:3], big), axis=0)
    ghi = jnp.max(jnp.where(nonempty[:, None], clusters[:, 3:6], -big), axis=0)
    t_cap = 2.0 * jnp.linalg.norm(jnp.maximum(ghi - glo, 0.0)) + 1.0
    scale = (jnp.float32(_KEY_MAX) - 4.0) / t_cap

    live_g = live.reshape(nb, nsc, m)
    sc_live = jnp.any(live_g, axis=2)                           # [NB, NSC]
    sc_t = jnp.min(jnp.where(live_g, tenter.reshape(nb, nsc, m), big),
                   axis=2)
    bits = jnp.sum(
        live_g.astype(jnp.int32)
        * (1 << jnp.arange(m, dtype=jnp.int32))[None, None, :], axis=2)

    tkey = jnp.clip(jnp.clip(jnp.where(sc_live, sc_t, big),
                             0.0, t_cap) * scale,
                    0.0, float(_KEY_MAX)).astype(jnp.int32)
    enc = tkey * 65536 + jnp.arange(nsc, dtype=jnp.int32)[None, :]
    rank = jnp.sum((enc[:, :, None] > enc[:, None, :]).astype(jnp.int32),
                   axis=2)                                      # [NB, NSC]
    # scatter (enc, bits) into their rank slots
    onehot = (rank[:, :, None]
              == jnp.arange(nsc, dtype=jnp.int32)[None, None, :])
    enc_sorted = jnp.sum(jnp.where(onehot, enc[:, :, None], 0), axis=1)
    bits_sorted = jnp.sum(jnp.where(onehot, bits[:, :, None], 0), axis=1)

    counts = jnp.sum(sc_live, axis=1).astype(jnp.int32)
    sw = ((nsc + 1) + 127) // 128 * 128
    pad_enc = jnp.pad(enc_sorted, ((0, 0), (0, sw - nsc)),
                      constant_values=_KEY_MAX * 65536)
    pad_bits = jnp.pad(bits_sorted, ((0, 0), (0, sw - nsc)))
    schedmask = jnp.concatenate([pad_enc, pad_bits], axis=1)    # [NB, 2*SW]
    return schedmask, counts, jnp.stack([scale, t_cap])


def _mt_epilogue(res, tmin, tmax, c: int):
    """Shared hit test on the matmul result [R, 4c] ->
    (t [R,c] masked with BIG_T on miss, hit [R,c], det [R,c]).
    tmin/tmax: [R, 1] (broadcast over the triangle lane axis)."""
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
def _bound_key(bound_f32, scale, t_cap):
    """f32 bound -> quantized i32 key, +2 so rounding in this f32 mul can
    never make the kernel break while the true tenter <= bound. Negative
    bounds (dead blocks use tmax = -1) clamp to key 2, below every live
    tenter key+2... and end the loop after at most a couple of no-hit
    iterations."""
    q = jnp.clip(bound_f32, 0.0, t_cap) * scale
    return q.astype(jnp.int32) + 2


_BIG_T_KEY = 1900671616  # BIG_T's f32 bit pattern with the lane bits cleared


def _closest_update(parts, cb, jc, tmin, tmax, lane, best_t, best_i, c):
    """One cluster's matmul + closest-hit reduction.

    The (min-t, argmin-lane) pair reduces in ONE lane fold: t is
    strictly positive here (t > tmin >= scene_epsilon), so its f32 bit
    pattern is order-preserving as i32; the low 7 mantissa bits carry
    the lane id (key = (t_bits & ~127) | lane). Quantizing t down by
    <= 127 ulp only makes the running bound smaller — conservative for
    the front-to-back break — and the winner's exact (t,u,v) is
    recomputed in f32 by refine_hit anyway."""
    res = _mt_matmul(parts, cb)                     # [R, 4c]
    t, _, _ = _mt_epilogue(res, tmin, tmax, c)      # [R, c]
    if c > 128:
        # lane id exceeds the 7-bit field (coarsened clusters beyond
        # 512k tris): two-reduction form
        bt = jnp.min(t, axis=1, keepdims=True)
        sel = (t <= bt) & (t < BIG_T)
        li = jnp.min(jnp.where(sel, lane, c), axis=1, keepdims=True)
        better = (li < c) & (bt < best_t)
        gi = jc * c + jnp.minimum(li, c - 1)
        return (jnp.where(better, bt, best_t),
                jnp.where(better, gi, best_i))
    key = jax.lax.bitwise_or(
        jax.lax.bitwise_and(
            jax.lax.bitcast_convert_type(t, jnp.int32), ~jnp.int32(127)),
        lane)
    kmin = jnp.min(key, axis=1, keepdims=True)      # [R, 1]
    bt = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(kmin, ~jnp.int32(127)), jnp.float32)
    # all-miss lanes carry BIG_T's (quantized-down) bits — gate on the
    # key so a full miss can never beat the running best
    better = (kmin < _BIG_T_KEY) & (bt < best_t)
    gi = jc * c + jax.lax.bitwise_and(kmin, jnp.int32(127))
    return (jnp.where(better, bt, best_t), jnp.where(better, gi, best_i))


def _closest_kernel(counts_ref, params_ref, sched_hbm, rays_ref, coef_ref,
                    t_out, idx_out, sched_s, ssem, *, sw: int, c: int):
    """Closest-hit, pack RESIDENT in VMEM (small scenes -> M == 1: the
    supercluster schedule degenerates to flat per-cluster entries and
    the member bitmask is never read)."""
    i = pl.program_id(0)
    r = rays_ref.shape[2]
    scale = params_ref[0]
    t_cap = params_ref[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)

    cp = pltpu.make_async_copy(sched_hbm.at[pl.dslice(i * GROUP, GROUP)],
                               sched_s, ssem)
    cp.start()
    cp.wait()

    def sub(g, _):
        b = i * GROUP + g
        # one [16,R] -> [R,16] transpose per sub-block puts the matmul in
        # the MXU's canonical [M,K]x[K,N] orientation (HBM stays dense)
        rays = jnp.transpose(rays_ref[g], (1, 0))   # [R, 16]
        parts = _ray_parts(rays)                    # one convert per block
        tmin = rays[:, 10:11]                       # [R, 1]
        tmax = rays[:, 11:12]
        count = counts_ref[b]
        tmax_blk = jnp.max(tmax)                    # scalar upper bound

        def cond(carry):
            l, bound_key, _, _ = carry
            # front-to-back: once a supercluster starts beyond every
            # ray's best hit (or every tmax), no later one can improve
            return (l < count) & (sched_s[g, l] // 65536 <= bound_key)

        def body(carry):
            l, bound_key, best_t, best_i = carry
            jc = jax.lax.rem(sched_s[g, l], 65536)
            best_t, best_i = _closest_update(
                parts, coef_ref[jc], jc, tmin, tmax, lane, best_t, best_i, c)
            new_bound = jnp.minimum(jnp.max(best_t), tmax_blk)
            return l + 1, _bound_key(new_bound, scale, t_cap), best_t, best_i

        _, _, bt_g, bi_g = jax.lax.while_loop(
            cond, body,
            (0, _bound_key(tmax_blk, scale, t_cap),
             jnp.full((r, 1), BIG_T, jnp.float32),
             jnp.full((r, 1), -1, jnp.int32)))
        t_out[pl.dslice(g, 1), :] = jnp.transpose(bt_g, (1, 0))
        idx_out[pl.dslice(g, 1), :] = jnp.transpose(bi_g, (1, 0))
        return 0

    jax.lax.fori_loop(0, GROUP, sub, 0)


# packs larger than this stay in HBM and stream per-supercluster through
# a double-buffered VMEM scratch (the whole-pack-resident BlockSpec would
# not fit VMEM); small packs load once and stay resident
_COEF_RESIDENT_BYTES = 4 * 1024 * 1024


def _closest_kernel_stream(counts_ref, params_ref, sched_hbm, rays_ref,
                           coef_hbm, t_out, idx_out, sched_s, ssem, scratch,
                           sem, *, sw: int, c: int, m: int):
    """Closest-hit with the cluster pack STREAMED from HBM.

    Identical math to _closest_kernel, but coef lives in HBM
    (memory_space=ANY) and each scheduled supercluster's [M, 16, 4c]
    coefficient slab is DMA'd into a 2-slot VMEM scratch: while
    supercluster l computes, supercluster l+1's copy is in flight
    (guide: double-buffering pattern). Dead member clusters are skipped
    by bitmask (their bytes ride the slab DMA — contiguity beats a
    per-member stall). The front-to-back early break can leave ONE
    in-flight copy; the epilogue waits it so no semaphore leaks."""
    i = pl.program_id(0)
    r = rays_ref.shape[2]
    scale = params_ref[0]
    t_cap = params_ref[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)

    cp = pltpu.make_async_copy(sched_hbm.at[pl.dslice(i * GROUP, GROUP)],
                               sched_s, ssem)
    cp.start()
    cp.wait()

    def sub(g, _):
        b = i * GROUP + g
        rays = jnp.transpose(rays_ref[g], (1, 0))    # [R, 16]
        parts = _ray_parts(rays)
        tmin = rays[:, 10:11]
        tmax = rays[:, 11:12]
        count = counts_ref[b]
        tmax_blk = jnp.max(tmax)

        def dma(slot, l):
            sc = jax.lax.rem(sched_s[g, l], 65536)
            return pltpu.make_async_copy(
                coef_hbm.at[pl.dslice(sc * m, m)], scratch.at[slot],
                sem.at[slot])

        @pl.when(count > 0)
        def _():
            dma(0, 0).start()

        def cond(carry):
            l, bound_key, _, _ = carry
            return (l < count) & (sched_s[g, l] // 65536 <= bound_key)

        def body(carry):
            l, bound_key, best_t, best_i = carry
            slot = jax.lax.rem(l, 2)

            @pl.when(l + 1 < count)
            def _():
                dma(1 - slot, l + 1).start()

            dma(slot, l).wait()
            sc = jax.lax.rem(sched_s[g, l], 65536)

            if m == 1:
                best_t, best_i = _closest_update(
                    parts, scratch[slot, 0], sc, tmin, tmax, lane,
                    best_t, best_i, c)
            else:
                bits = sched_s[g, sw + l]

                def member(mi, carry_m):
                    bt, bi = carry_m
                    return jax.lax.cond(
                        jax.lax.rem(jax.lax.shift_right_logical(bits, mi),
                                    2) == 1,
                        lambda bt, bi: _closest_update(
                            parts, scratch[slot, mi], sc * m + mi, tmin,
                            tmax, lane, bt, bi, c),
                        lambda bt, bi: (bt, bi),
                        bt, bi)

                best_t, best_i = jax.lax.fori_loop(
                    0, m, member, (best_t, best_i))

            new_bound = jnp.minimum(jnp.max(best_t), tmax_blk)
            return (l + 1, _bound_key(new_bound, scale, t_cap),
                    best_t, best_i)

        lf, _, bt_g, bi_g = jax.lax.while_loop(
            cond, body,
            (0, _bound_key(tmax_blk, scale, t_cap),
             jnp.full((r, 1), BIG_T, jnp.float32),
             jnp.full((r, 1), -1, jnp.int32)))

        # drain the possibly in-flight prefetch (early break / cold
        # cond-fail both leave exactly one)
        @pl.when(jnp.minimum(count, lf + 1) - lf > 0)
        def _():
            dma(jax.lax.rem(lf, 2), lf).wait()

        t_out[pl.dslice(g, 1), :] = jnp.transpose(bt_g, (1, 0))
        idx_out[pl.dslice(g, 1), :] = jnp.transpose(bi_g, (1, 0))
        return 0

    jax.lax.fori_loop(0, GROUP, sub, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call(raysT, coef, clusters, interpret: bool):
    sched, counts, params = cluster_schedule(raysT, clusters)
    return _closest_call_pre(raysT, coef, sched, counts, params, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call_pre(raysT, coef, schedmask, counts, params,
                      interpret: bool):
    nb = raysT.shape[0]
    nc = coef.shape[0]
    c = coef.shape[2] // 4
    m = pick_members(nc)
    ng = nb // GROUP
    sw = schedmask.shape[1] // 2

    packed = _pack_coef(coef)
    krows = packed.shape[1]
    stream = packed.size * packed.dtype.itemsize > _COEF_RESIDENT_BYTES
    coef_spec = (
        pl.BlockSpec(memory_space=pltpu.ANY) if stream
        else pl.BlockSpec((nc, krows, 4 * c), lambda i, n, p: (0, 0, 0),
                          memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # schedmask rows (DMA)
            pl.BlockSpec((GROUP, 16, RAY_BLOCK),
                         lambda i, n, p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            coef_spec,
        ],
        out_specs=[
            pl.BlockSpec((GROUP, RAY_BLOCK), lambda i, n, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, RAY_BLOCK), lambda i, n, p: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [pltpu.SMEM((GROUP, 2 * sw), jnp.int32),
             pltpu.SemaphoreType.DMA(())]
            + ([pltpu.VMEM((2, m, krows, 4 * c), packed.dtype),
                pltpu.SemaphoreType.DMA((2,))] if stream else [])
        ),
    )
    if stream:
        kern = functools.partial(_closest_kernel_stream, sw=sw, c=c, m=m)
    else:
        assert m == 1, "resident packs are <= 32k tris -> flat schedule"
        kern = functools.partial(_closest_kernel, sw=sw, c=c)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(counts, params, schedmask, raysT, packed)


def intersect_pallas(scene, ro: Vec3, rd: Vec3, t_min, t_max) -> Hit:
    """Closest-hit via the block-sparse MXU cluster kernel (SoA rays).

    Returns only (t, tri) from the kernel; (u, v) are zeros — callers go
    through `intersect.refine_hit`, which recomputes t/u/v for the
    winning triangle in f32 (and differentiably)."""
    raysT, n = pack_raysT(ro, rd, t_min, t_max)
    coef, _aux, clusters = scene_pack(scene)
    t, idx = _closest_call(raysT, coef, clusters, _interpret())
    z = jnp.zeros((n,), jnp.float32)
    return Hit(t=t.reshape(-1)[:n], tri=idx.reshape(-1)[:n], u=z, v=z)


# ---------------------------------------------------------------- occlusion
def _occlusion_update(parts, cb, ab, tflag, tmin, tmax, atten, c):
    """One cluster's matmul + shadow epilogue.
    ab: [8, c] aux rows; tflag: scalar — 1 iff the cluster holds ANY
    transparent triangle; atten: (ar, ag, ab) [R,1] carries.

    Clusters without transparent occluders (the overwhelming majority —
    the flag is per cluster, prefetched) take a 1-reduce binary path:
    the full fresnel + 3x log2(c) lane-product epilogue was the measured
    bottleneck of the whole shade stage (NEE occlusion 68 ms of 146 ms
    at 612k rays — epilogue-, not MXU-, bound)."""
    res = _mt_matmul(parts, cb)
    t, hit, det = _mt_epilogue(res, tmin, tmax, c)   # [R, c]

    def lane_prod(x):
        # exact triangle-axis product via log2(c) pairwise folds
        # (jnp.prod reductions don't lower natively on Mosaic)
        width = c
        while width > 1:
            half = width // 2
            x = x[:, :half] * x[:, half:width]
            width = half
        return x                                     # [R, 1]

    def transp_fn(atten):
        transp = ab[0:1, :]                          # [1, c]
        inv_n = ab[4:5, :]
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
        ar, ag, abl = atten
        return (ar * lane_prod(factor(ab[1:2, :])),
                ag * lane_prod(factor(ab[2:3, :])),
                abl * lane_prod(factor(ab[3:4, :])))

    def opaque_fn(atten):
        # all-opaque cluster: any hit kills the ray (diffuse.cu:226-231)
        keep = 1.0 - jnp.max(hit.astype(jnp.float32), axis=1,
                             keepdims=True)          # [R, 1]
        ar, ag, abl = atten
        return (ar * keep, ag * keep, abl * keep)

    return jax.lax.cond(tflag == 1, transp_fn, opaque_fn, atten)


def _occlusion_kernel(counts_ref, params_ref, tflag_ref, sched_hbm,
                      rays_ref, coef_ref, aux_ref, ar_out, ag_out, ab_out,
                      sched_s, ssem, *, sw: int, c: int):
    i = pl.program_id(0)
    r = rays_ref.shape[2]

    cp = pltpu.make_async_copy(sched_hbm.at[pl.dslice(i * GROUP, GROUP)],
                               sched_s, ssem)
    cp.start()
    cp.wait()

    def sub(g, _):
        b = i * GROUP + g
        rays = jnp.transpose(rays_ref[g], (1, 0))            # [R, 16]
        parts = _ray_parts(rays)
        tmin = rays[:, 10:11]
        tmax = rays[:, 11:12]
        count = counts_ref[b]
        tmax_key = _bound_key(jnp.max(tmax), params_ref[0], params_ref[1])

        def cond(carry):
            l, live, _ = carry
            return (l < count) & live & (sched_s[g, l] // 65536 <= tmax_key)

        def body(carry):
            l, live, atten = carry
            jc = jax.lax.rem(sched_s[g, l], 65536)
            atten = _occlusion_update(parts, coef_ref[jc], aux_ref[jc],
                                      tflag_ref[jc], tmin, tmax, atten, c)
            # any-hit early-out: stop once every ray is fully occluded
            live2 = jnp.max(atten[0] + atten[1] + atten[2]) > 0.0
            return l + 1, live2, atten

        ones = jnp.ones((r, 1), jnp.float32)
        _, _, (ar_g, ag_g, ab_g) = jax.lax.while_loop(
            cond, body, (0, jnp.bool_(True), (ones, ones, ones)))
        ar_out[pl.dslice(g, 1), :] = jnp.transpose(ar_g, (1, 0))
        ag_out[pl.dslice(g, 1), :] = jnp.transpose(ag_g, (1, 0))
        ab_out[pl.dslice(g, 1), :] = jnp.transpose(ab_g, (1, 0))
        return 0

    jax.lax.fori_loop(0, GROUP, sub, 0)


def _occlusion_kernel_stream(counts_ref, params_ref, tflag_ref, sched_hbm,
                             rays_ref, coef_hbm, aux_hbm, ar_out, ag_out,
                             ab_out, sched_s, ssem, scratch, aux_s, sem,
                             sem_a, *, sw: int, c: int, m: int):
    """Occlusion with the pack + aux rows streamed from HBM per
    supercluster (see _closest_kernel_stream for the double-buffer /
    drain pattern; each entry moves TWO slabs — coef and aux — on
    paired semaphores)."""
    i = pl.program_id(0)
    r = rays_ref.shape[2]

    cp = pltpu.make_async_copy(sched_hbm.at[pl.dslice(i * GROUP, GROUP)],
                               sched_s, ssem)
    cp.start()
    cp.wait()

    def sub(g, _):
        b = i * GROUP + g
        rays = jnp.transpose(rays_ref[g], (1, 0))
        parts = _ray_parts(rays)
        tmin = rays[:, 10:11]
        tmax = rays[:, 11:12]
        count = counts_ref[b]
        tmax_key = _bound_key(jnp.max(tmax), params_ref[0], params_ref[1])

        def dmas(slot, l):
            sc = jax.lax.rem(sched_s[g, l], 65536)
            return (
                pltpu.make_async_copy(coef_hbm.at[pl.dslice(sc * m, m)],
                                      scratch.at[slot], sem.at[slot]),
                pltpu.make_async_copy(aux_hbm.at[pl.dslice(sc * m, m)],
                                      aux_s.at[slot], sem_a.at[slot]),
            )

        @pl.when(count > 0)
        def _():
            for d in dmas(0, 0):
                d.start()

        def cond(carry):
            l, live, _ = carry
            return (l < count) & live & (sched_s[g, l] // 65536 <= tmax_key)

        def body(carry):
            l, live, atten = carry
            slot = jax.lax.rem(l, 2)

            @pl.when(l + 1 < count)
            def _():
                for d in dmas(1 - slot, l + 1):
                    d.start()

            for d in dmas(slot, l):
                d.wait()
            sc = jax.lax.rem(sched_s[g, l], 65536)

            if m == 1:
                atten = _occlusion_update(parts, scratch[slot, 0],
                                          aux_s[slot, 0], tflag_ref[sc],
                                          tmin, tmax, atten, c)
            else:
                bits = sched_s[g, sw + l]

                def member(mi, atten_m):
                    return jax.lax.cond(
                        jax.lax.rem(jax.lax.shift_right_logical(bits, mi),
                                    2) == 1,
                        lambda a: _occlusion_update(
                            parts, scratch[slot, mi], aux_s[slot, mi],
                            tflag_ref[sc * m + mi], tmin, tmax, a, c),
                        lambda a: a,
                        atten_m)

                atten = jax.lax.fori_loop(0, m, member, atten)

            live2 = jnp.max(atten[0] + atten[1] + atten[2]) > 0.0
            return l + 1, live2, atten

        ones = jnp.ones((r, 1), jnp.float32)
        lf, _, (ar_g, ag_g, ab_g) = jax.lax.while_loop(
            cond, body, (0, jnp.bool_(True), (ones, ones, ones)))

        @pl.when(jnp.minimum(count, lf + 1) - lf > 0)
        def _():
            for d in dmas(jax.lax.rem(lf, 2), lf):
                d.wait()

        ar_out[pl.dslice(g, 1), :] = jnp.transpose(ar_g, (1, 0))
        ag_out[pl.dslice(g, 1), :] = jnp.transpose(ag_g, (1, 0))
        ab_out[pl.dslice(g, 1), :] = jnp.transpose(ab_g, (1, 0))
        return 0

    jax.lax.fori_loop(0, GROUP, sub, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occlusion_call(raysT, coef, aux, clusters, interpret: bool):
    sched, counts, params = cluster_schedule(raysT, clusters)
    return _occlusion_call_pre(raysT, coef, aux, sched, counts, params,
                               interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occlusion_call_pre(raysT, coef, aux, schedmask, counts, params,
                        interpret: bool):
    nb = raysT.shape[0]
    nc = coef.shape[0]
    c = coef.shape[2] // 4
    m = pick_members(nc)
    ng = nb // GROUP
    sw = schedmask.shape[1] // 2

    # per-cluster "holds any transparent triangle" flag — selects the
    # cheap binary-visibility epilogue for all-opaque clusters
    tflags = (jnp.max(aux[:, 0, :], axis=1) > 0.0).astype(jnp.int32)

    packed = _pack_coef(coef)
    krows = packed.shape[1]
    stream = packed.size * packed.dtype.itemsize > _COEF_RESIDENT_BYTES
    if stream:
        pack_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 2
    else:
        pack_specs = [
            pl.BlockSpec((nc, krows, 4 * c), lambda i, n, t, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, 8, c), lambda i, n, t, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # schedmask rows (DMA)
            pl.BlockSpec((GROUP, 16, RAY_BLOCK),
                         lambda i, n, t, p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + pack_specs,
        out_specs=[
            pl.BlockSpec((GROUP, RAY_BLOCK), lambda i, n, t, p: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=(
            [pltpu.SMEM((GROUP, 2 * sw), jnp.int32),
             pltpu.SemaphoreType.DMA(())]
            + ([pltpu.VMEM((2, m, krows, 4 * c), packed.dtype),
                pltpu.VMEM((2, m, 8, c), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,))] if stream else [])
        ),
    )
    if stream:
        kern = functools.partial(_occlusion_kernel_stream, sw=sw, c=c, m=m)
    else:
        assert m == 1, "resident packs are <= 32k tris -> flat schedule"
        kern = functools.partial(_occlusion_kernel, sw=sw, c=c)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.float32)] * 3,
        interpret=interpret,
    )(counts, params, tflags, schedmask, raysT, packed, aux)


def occlusion_pallas(scene, ro: Vec3, rd: Vec3, t_min, t_max) -> Vec3:
    """Shadow attenuation (SoA in, SoA out)."""
    raysT, n = pack_raysT(ro, rd, t_min, t_max)
    coef, aux, clusters = scene_pack(scene)
    ar, ag, ab = _occlusion_call(raysT, coef, aux, clusters, _interpret())
    cut = lambda a: a.reshape(-1)[:n]
    return Vec3(cut(ar), cut(ag), cut(ab))


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
