"""Ray / triangle-soup intersection.

TPU-native replacement for OptiX's `rtTrace` + the reference's
intersection programs (`REF/cuda/triangle_mesh.cu:59-106` indexed-triangle
intersect, `intersection_refinement.h:36-99` refined secondary-ray
origins). There are no RT cores on TPU, so intersection is a dense
vector problem: batches of rays against blocks of triangles on the VPU,
with the closest-hit reduction fused in.

Backends:
  - `intersect_brute`      pure-XLA scan over triangle blocks (any device)
  - `pallas_isect`         Pallas TPU kernel: MXU Cramer matmul per
    live cluster, front-to-back while_loop schedule
  - BVH packet traversal lives in `fovtrace.kernels.bvh_traverse`

PRIMARY API (round 3, SoA): `intersect_v` / `occlusion_v` /
`hit_surface_v` / `refine_hit_v` take `Vec3` ray components ([N] each)
and return SoA results — dense on TPU (see fovtrace.core.vec). The
row-based `intersect` / `occlusion` / `hit_surface` remain as thin
wrappers over the SoA path for tests and the CPU oracle. Hit triangle
ids are discrete and treated as constants under differentiation
(`stop_gradient`); positions/shading stay differentiable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fovtrace.core import mathx, vec
from fovtrace.core.vec import Vec3

BIG_T = 1e30
DET_EPS = 1e-12


@struct.dataclass
class Hit:
    t: jnp.ndarray       # [N] distance (BIG_T if miss)
    tri: jnp.ndarray     # [N] int32 triangle id (-1 if miss)
    u: jnp.ndarray       # [N] barycentric u
    v: jnp.ndarray       # [N] barycentric v

    @property
    def valid(self):
        return self.tri >= 0


def _mt_block(ro, rd, v0, e1, e2, t_min, t_max):
    """Moller-Trumbore for [C] rays x [B] triangles -> (t, u, v, hit) [C,B].

    Broadcast layout: rays [C,1,3] against triangles [1,B,3].
    """
    o = ro[:, None, :]
    d = rd[:, None, :]
    v0b = v0[None, :, :]
    e1b = e1[None, :, :]
    e2b = e2[None, :, :]

    pvec = jnp.cross(d, e2b)
    det = jnp.sum(e1b * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0b
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1b)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2b * qvec, axis=-1) * inv_det

    hit = (
        (jnp.abs(det) > DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min[:, None])
        & (t < t_max[:, None])
    )
    return t, u, v, hit


def _reduce_closest(t, u, v, hit, tri_base):
    """Closest hit across the triangle axis of [C,B] block results."""
    t_masked = jnp.where(hit, t, BIG_T)
    best = jnp.argmin(t_masked, axis=1)
    c = jnp.arange(t.shape[0])
    bt = t_masked[c, best]
    return (
        bt,
        jnp.where(bt < BIG_T, tri_base + best, -1).astype(jnp.int32),
        u[c, best],
        v[c, best],
    )


def intersect_brute(
    scene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min,
    t_max,
    tri_block: int = 512,
    ray_chunk: int = 8192,
) -> Hit:
    """Closest-hit over all triangles; scan over triangle blocks, map over
    ray chunks to bound memory. Pure XLA — runs on CPU/TPU alike."""
    n = ro.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    num_tris = scene.v0.shape[0]
    tb = min(tri_block, num_tris)
    pad_t = (-num_tris) % tb
    v0 = jnp.pad(scene.v0, ((0, pad_t), (0, 0)))
    e1 = jnp.pad(scene.e1, ((0, pad_t), (0, 0)))
    e2 = jnp.pad(scene.e2, ((0, pad_t), (0, 0)))
    # padding triangles are degenerate (e1=e2=0 -> det=0 -> no hit)
    nblk = v0.shape[0] // tb
    v0b = v0.reshape(nblk, tb, 3)
    e1b = e1.reshape(nblk, tb, 3)
    e2b = e2.reshape(nblk, tb, 3)

    rc = min(ray_chunk, n)
    pad_r = (-n) % rc
    ro_p = jnp.pad(ro, ((0, pad_r), (0, 0)))
    rd_p = jnp.pad(rd, ((0, pad_r), (0, 0)))
    tmin_p = jnp.pad(t_min, (0, pad_r))
    tmax_p = jnp.pad(t_max, (0, pad_r), constant_values=-1.0)
    nchunk = ro_p.shape[0] // rc

    def per_chunk(args):
        co, cd, ctmin, ctmax = args

        # map over triangle blocks -> stacked per-block best hits, then one
        # argmin reduce. No scan carries: carry-free form stays valid under
        # shard_map autodiff (scan carries must keep a stable
        # varying-manual-axes type, which grad-of-shard_map breaks).
        def body(blk):
            bv0, be1, be2, base = blk
            t, u, v, hit = _mt_block(co, cd, bv0, be1, be2, ctmin, ctmax)
            return _reduce_closest(t, u, v, hit, base)

        bases = jnp.arange(nblk, dtype=jnp.int32) * tb
        ts, tris, us, vs = jax.lax.map(body, (v0b, e1b, e2b, bases))
        k = jnp.argmin(ts, axis=0)
        c = jnp.arange(ts.shape[1])
        return ts[k, c], tris[k, c], us[k, c], vs[k, c]

    chunks = (
        ro_p.reshape(nchunk, rc, 3),
        rd_p.reshape(nchunk, rc, 3),
        tmin_p.reshape(nchunk, rc),
        tmax_p.reshape(nchunk, rc),
    )
    bt, btri, bu, bv = jax.lax.map(per_chunk, chunks)
    flat = lambda a: a.reshape(-1)[:n]
    return Hit(t=flat(bt), tri=flat(btri), u=flat(bu), v=flat(bv))


def occlusion_brute(
    scene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min,
    t_max,
    tri_block: int = 512,
    ray_chunk: int = 8192,
) -> jnp.ndarray:
    """Any-hit shadow attenuation [N,3].

    Mirrors the reference's shadow any-hit programs: opaque materials
    terminate the ray (attenuation 0; diffuse.cu:226-231), refractive
    surfaces multiply a Schlick-fresnel transparency and continue
    (refraction.cu:144-153: atten *= 1 - fresnel_schlick(|n.d|, 5,
    1-shadow_attenuation, 1)).
    """
    n = ro.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    mats = scene.materials
    # per-triangle: is the surface a transparent shadow caster?
    tri_kind = jnp.where(scene.mat_id >= 0, mats.kind[jnp.maximum(scene.mat_id, 0)], -1)
    tri_shadow_att = jnp.where(
        scene.mat_id[:, None] >= 0,
        mats.shadow_attenuation[jnp.maximum(scene.mat_id, 0)],
        jnp.ones((1, 3), jnp.float32),
    )
    from fovtrace.scene.scene import MATL_REFRACTION

    tri_transparent = tri_kind == MATL_REFRACTION

    # geometric normals for the fresnel term
    gn = jnp.cross(scene.e1, scene.e2)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)

    num_tris = scene.v0.shape[0]
    tb = min(tri_block, num_tris)
    pad_t = (-num_tris) % tb
    padv = lambda a: jnp.pad(a, ((0, pad_t),) + ((0, 0),) * (a.ndim - 1))
    v0 = padv(scene.v0); e1 = padv(scene.e1); e2 = padv(scene.e2)
    gn_p = padv(gn)
    transp = jnp.pad(tri_transparent, (0, pad_t))
    satt = jnp.pad(tri_shadow_att, ((0, pad_t), (0, 0)), constant_values=1.0)
    valid_tri = jnp.pad(scene.mat_id >= 0, (0, pad_t))

    nblk = v0.shape[0] // tb
    rsh = lambda a: a.reshape((nblk, tb) + a.shape[1:])
    v0b, e1b, e2b = rsh(v0), rsh(e1), rsh(e2)
    gnb, transpb, sattb, validb = rsh(gn_p), rsh(transp), rsh(satt), rsh(valid_tri)

    rc = min(ray_chunk, n)
    pad_r = (-n) % rc
    ro_p = jnp.pad(ro, ((0, pad_r), (0, 0)))
    rd_p = jnp.pad(rd, ((0, pad_r), (0, 0)))
    tmin_p = jnp.pad(t_min, (0, pad_r))
    tmax_p = jnp.pad(t_max, (0, pad_r), constant_values=-1.0)
    nchunk = ro_p.shape[0] // rc

    def per_chunk(args):
        co, cd, ctmin, ctmax = args

        # carry-free: per-block attenuation factors, combined by product
        def body(blk):
            bv0, be1, be2, bgn, btr, bsa, bvalid = blk
            _, _, _, hit = _mt_block(co, cd, bv0, be1, be2, ctmin, ctmax)
            hit = hit & bvalid[None, :]
            # fresnel-attenuated transparency for refractive occluders
            ndi = jnp.abs(jnp.sum(cd[:, None, :] * bgn[None, :, :], axis=-1))
            c5 = jnp.clip(1.0 - ndi, 0.0, 1.0) ** 5
            # 1 - schlick(nDi, 5, 1-shadow_att, 1): per-channel transparency
            trans = 1.0 - ((1.0 - bsa[None, :, :]) + bsa[None, :, :] * c5[..., None])
            factor = jnp.where(
                hit[..., None],
                jnp.where(btr[None, :, None], jnp.clip(trans, 0.0, 1.0), 0.0),
                1.0,
            )
            return jnp.prod(factor, axis=1)

        factors = jax.lax.map(body, (v0b, e1b, e2b, gnb, transpb, sattb, validb))
        return jnp.prod(factors, axis=0)

    chunks = (
        ro_p.reshape(nchunk, rc, 3),
        rd_p.reshape(nchunk, rc, 3),
        tmin_p.reshape(nchunk, rc),
        tmax_p.reshape(nchunk, rc),
    )
    atten = jax.lax.map(per_chunk, chunks)
    return atten.reshape(-1, 3)[:n]


# ------------------------------------------------------------- dispatchers
def _tri_component(col, tri):
    """Dense per-component triangle fetch: slice a [T,3] column to [T]
    (tiny, CSE'd across bounces) then a 1-D gather — never materializes a
    lane-padded [N,3] gather result."""
    return col[tri]


def refine_hit_v(scene, ro: Vec3, rd: Vec3, hit: Hit) -> Hit:
    """Recompute (t, u, v) differentiably for the already-found triangle.

    Traversal is discrete (and reverse-mode can't cross its while_loop),
    so the kernels run under stop_gradient and this O(N) Moller-Trumbore
    recompute restores exact gradients w.r.t. rays and vertices — the
    backward pass never touches the acceleration structure. (This also
    shrinks the brute-force backward from O(N*T) to O(N).)

    Attribute fetch is ONE [N,9] row gather (the TPU gather engine moves
    a row per index; per-component 1-D gathers are ~20x slower) from a
    concat of the DIFFERENTIABLE scene arrays, so geometry gradients
    flow; the math is SoA.
    """
    tri = jax.lax.stop_gradient(jnp.maximum(hit.tri, 0))
    geom = jnp.concatenate([scene.v0, scene.e1, scene.e2], axis=1)  # [T,9]
    g = geom[tri].T                                                 # [9,N]
    v0 = Vec3(g[0], g[1], g[2])
    e1 = Vec3(g[3], g[4], g[5])
    e2 = Vec3(g[6], g[7], g[8])
    pvec = vec.cross(rd, e2)
    det = vec.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
    tvec = ro - v0
    u = vec.dot(tvec, pvec) * inv_det
    qvec = vec.cross(tvec, e1)
    v = vec.dot(rd, qvec) * inv_det
    t = vec.dot(e2, qvec) * inv_det
    valid = hit.tri >= 0
    return Hit(
        t=jnp.where(valid, t, BIG_T),
        tri=hit.tri,
        u=jnp.where(valid, u, 0.0),
        v=jnp.where(valid, v, 0.0),
    )


def refine_hit(scene, ro, rd, hit: Hit) -> Hit:
    """Row-API wrapper over refine_hit_v."""
    return refine_hit_v(scene, vec.from_rows(ro), vec.from_rows(rd), hit)


def _pick_backend(scene, backend: str) -> str:
    """auto: the Pallas cluster kernel on TPU (pallas_isect — the fast
    path); brute force elsewhere (carry-free, so it stays valid under
    grad-of-shard_map, which the packet-BVH while_loop does not — the
    'bvh' backend remains available explicitly)."""
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "brute"


def intersect_v(scene, ro: Vec3, rd: Vec3, t_min, t_max,
                backend: str = "auto", packet: int = 1024) -> Hit:
    """Closest-hit dispatcher (SoA). Always differentiable via
    refine_hit_v."""
    backend = _pick_backend(scene, backend)
    sg = jax.lax.stop_gradient
    if backend == "pallas":
        from fovtrace.kernels import pallas_isect

        raw = pallas_isect.intersect_pallas(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max))
    elif backend == "bvh":
        from fovtrace.kernels import bvh_traverse

        raw = bvh_traverse.intersect_bvh(
            sg(scene), sg(vec.to_rows(ro)), sg(vec.to_rows(rd)),
            sg(t_min), sg(t_max), packet
        )
    else:
        raw = intersect_brute(sg(scene), sg(vec.to_rows(ro)),
                              sg(vec.to_rows(rd)), sg(t_min), sg(t_max))
    return refine_hit_v(scene, ro, rd, raw)


def intersect(scene, ro, rd, t_min, t_max, backend: str = "auto",
              packet: int = 1024) -> Hit:
    """Row-API wrapper over intersect_v."""
    return intersect_v(scene, vec.from_rows(ro), vec.from_rows(rd),
                       t_min, t_max, backend, packet)


def occlusion_v(scene, ro: Vec3, rd: Vec3, t_min, t_max,
                backend: str = "auto", packet: int = 1024) -> Vec3:
    """Shadow-attenuation dispatcher (SoA in/out). Visibility is treated
    as locally constant under differentiation (standard differentiable-
    rendering convention for binary occlusion; SURVEY.md §7 #3)."""
    backend = _pick_backend(scene, backend)
    sg = jax.lax.stop_gradient
    if backend == "pallas":
        from fovtrace.kernels import pallas_isect

        att = pallas_isect.occlusion_pallas(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max))
        return att.map(sg)
    if backend == "bvh":
        from fovtrace.kernels import bvh_traverse

        rows = sg(bvh_traverse.occlusion_bvh(
            sg(scene), sg(vec.to_rows(ro)), sg(vec.to_rows(rd)),
            sg(t_min), sg(t_max), packet))
        return vec.from_rows(rows)
    rows = sg(occlusion_brute(sg(scene), sg(vec.to_rows(ro)),
                              sg(vec.to_rows(rd)), sg(t_min), sg(t_max)))
    return vec.from_rows(rows)


def occlusion(scene, ro, rd, t_min, t_max, backend: str = "auto",
              packet: int = 1024) -> jnp.ndarray:
    """Row-API wrapper over occlusion_v."""
    return vec.to_rows(occlusion_v(scene, vec.from_rows(ro),
                                   vec.from_rows(rd), t_min, t_max,
                                   backend, packet))


# --------------------------------------------------------------- shading IO
def onehot_rows(ids: jnp.ndarray, m: int) -> jnp.ndarray:
    """[N, M] f32 one-hot of clamped int ids — the TPU-fast way to read
    small tables: `onehot @ table` is one MXU matmul, whereas `table[ids]`
    is a scalar-unit gather. Differentiable w.r.t. the table."""
    return (ids[:, None] == jnp.arange(m, dtype=ids.dtype)[None, :]).astype(
        jnp.float32
    )


def onehot_cols(ids: jnp.ndarray, m: int) -> jnp.ndarray:
    """[M, N] f32 transposed one-hot: M rides the (tiny) sublane axis,
    N the dense lane axis — the layout-correct orientation on TPU."""
    return (ids[None, :] == jnp.arange(m, dtype=ids.dtype)[:, None]).astype(
        jnp.float32
    )


# material tables at or below this many rows use the select-chain path
_SELECT_CHAIN_MAX_M = 16


def material_lookup_v(materials, safe_mat: jnp.ndarray, columns) -> list:
    """Fetch several per-material columns for each ray (SoA).

    Two regimes (both differentiable w.r.t. the table — selects/gathers
    scatter-add cotangents back into the entries):
      - M <= 16 (every shipped scene): a SELECT CHAIN — each of the K
        output rows is (M-1) `where`s against broadcast scalars, pure
        full-lane VPU work. Measured 11.7 ms (row gather) -> ~1 ms at
        612k rays x 21 columns x 4 materials.
      - larger M: ONE [N,K] row gather from the concatenated table (the
        gather engine moves a row per index). One-hot matmuls are
        pathological for tiny M in either orientation (measured 95ms
        for the [K,M]@[M,N] form).

    columns: list of (name, width). width-3 columns return Vec3, width-1
    return [N]; other widths return the dense [width, N] row block.
    """
    cols = []
    for name, width in columns:
        col = getattr(materials, name).astype(jnp.float32)
        cols.append(col[:, None] if col.ndim == 1 else col)
    table = jnp.concatenate(cols, axis=1)            # [M, K]
    m_count, k_count = table.shape

    if m_count <= _SELECT_CHAIN_MAX_M:
        masks = [safe_mat == m for m in range(1, m_count)]
        vals = []
        for k in range(k_count):
            acc = jnp.broadcast_to(table[0, k], safe_mat.shape)
            for m in range(1, m_count):
                acc = jnp.where(masks[m - 1], table[m, k], acc)
            vals.append(acc)
    else:
        # gather rows, then ONE transpose to [K, N] so per-column
        # unpacking slices dense [N] rows — slicing columns out of the
        # lane-padded [N, K] result re-reads the 128-lane-padded buffer
        # per column (measured 2.2x slower at 612k rays)
        vals = table[safe_mat].T                     # [K, N]

    out = []
    off = 0
    for name, width in columns:
        if width == 1:
            out.append(vals[off])
        elif width == 3:
            out.append(Vec3(vals[off], vals[off + 1], vals[off + 2]))
        else:
            # Generic widths return the dense [width, N] row block —
            # callers unpack rows themselves rather than transposing back
            # to the lane-padded [N, width] layout warned about above.
            out.append(jnp.stack(vals[off:off + width])
                       if isinstance(vals, list)
                       else vals[off:off + width])
        off += width
    return out


def material_lookup(materials, safe_mat: jnp.ndarray, columns) -> list:
    """Row-API wrapper over material_lookup_v (width-3 -> [N,3])."""
    out = material_lookup_v(materials, safe_mat, columns)
    return [vec.to_rows(o) if isinstance(o, Vec3) else o for o in out]


def hit_surface_v(scene, ro: Vec3, rd: Vec3, hit: Hit):
    """Interpolate surface attributes at hits (SoA).

    Returns dict with: point/normal/gnormal/kd (Vec3 of [N]), u_tex/v_tex
    [N], mat_id [N], t_safe [N]. Matches triangle_mesh.cu:59-106
    barycentric interpolation; the hit point is recomputed as o + t*d
    (the 'refined' front hit surrogate). Triangle ids are
    stop-gradiented; positions remain differentiable through t, u, v.

    Attribute fetch: ONE [N,24] row gather from the `scene.tri_attr`
    pack (built by with_pack). The TPU gather engine moves a row per
    index — measured ~10ms at 2M rays vs ~385ms for per-component 1-D
    gathers; the padded gather result is consumed fused.
    """
    tri = jax.lax.stop_gradient(jnp.maximum(hit.tri, 0))
    u = hit.u
    v = hit.v
    w = 1.0 - u - v

    at = getattr(scene, "tri_attr", None)
    if at is None:
        # un-packed scene: build the pack on the fly (CSE'd per frame;
        # also keeps vertex-normal gradients live for unpacked scenes)
        gn0 = jnp.cross(scene.e1, scene.e2)
        gn0 = gn0 / jnp.maximum(
            jnp.linalg.norm(gn0, axis=-1, keepdims=True), 1e-20)
        at = jnp.concatenate(
            [scene.n0, scene.n1, scene.n2, gn0,
             scene.uv0, scene.uv1, scene.uv2,
             scene.mat_id[:, None].astype(jnp.float32)], axis=1)
    # row gather then ONE transpose -> [24, N]: per-attribute unpacking
    # below slices dense [N] rows instead of re-reading the lane-padded
    # [N, 24] buffer per column (measured 2.2x at 612k rays)
    a = at[tri].T                                     # [24, N]
    gv = lambda r: Vec3(a[r], a[r + 1], a[r + 2])
    n0, n1, n2 = gv(0), gv(3), gv(6)
    gn = gv(9)

    n_sh = vec.normalize(n0 * w + n1 * u + n2 * v)
    u_tex = a[12] * w + a[14] * u + a[16] * v
    v_tex = a[13] * w + a[15] * u + a[17] * v
    mat_id = jnp.where(hit.tri >= 0, a[18].astype(jnp.int32), -1)

    # miss lanes carry t = BIG_T; clamp them so downstream dead-lane math
    # (light distance, Beer's law) stays finite — otherwise inf
    # intermediates poison the backward pass through where (0*inf = NaN).
    t_safe = jnp.where(hit.valid, hit.t, 0.0)
    point = ro + rd * t_safe

    safe_mat = jnp.maximum(mat_id, 0)
    kd, tex_id_f = material_lookup_v(
        scene.materials, safe_mat, [("kd", 3), ("texture_id", 1)]
    )
    tex_id = tex_id_f.astype(jnp.int32)

    # albedo texture lookup (nearest; Kd_map in load_obj PathTracer.cpp:702)
    ntex, th, tw = (
        scene.textures.shape[0],
        scene.textures.shape[1],
        scene.textures.shape[2],
    )
    # skip the texel gather for the 1x1x1 placeholder atlas (no scene
    # textures) — statically decidable from the atlas shape
    if ntex > 1 or th * tw > 1:
        tx = jnp.clip((u_tex % 1.0) * tw, 0, tw - 1).astype(jnp.int32)
        ty = jnp.clip((v_tex % 1.0) * th, 0, th - 1).astype(jnp.int32)
        ti = jnp.clip(tex_id, 0, ntex - 1)
        # ONE row gather via the linearized atlas (3 scalar 3-D gathers
        # are ~20x slower on TPU)
        flat = scene.textures.reshape(-1, 3)
        texel_rows = flat[(ti * th + ty) * tw + tx].T     # [3,N]
        texel = Vec3(texel_rows[0], texel_rows[1], texel_rows[2])
        kd = vec.where(tex_id >= 0, kd * texel, kd)

    return {
        "point": point,
        "normal": n_sh,
        "gnormal": gn,
        "u_tex": u_tex,
        "v_tex": v_tex,
        "mat_id": mat_id,
        "kd": kd,
        "t_safe": t_safe,
    }


def intersect_surface_v(scene, ro: Vec3, rd: Vec3, t_min, t_max,
                        backend: str = "auto", packet: int = 1024):
    """Fused closest-hit + refine + surface interpolation: ONE row
    gather where intersect_v + hit_surface_v do two.

    refine_hit_v gathers [N,9] geometry and hit_surface_v gathers
    [N,24] attributes — both indexed by the SAME winning triangle id,
    and a row gather's cost is per-index, not per-column (~20 ms each
    at 2.1M rays). Here the differentiable geometry arrays are
    concatenated with the attribute pack per frame (a [T,33] concat of
    live arrays, CSE'd across bounces; gradients still flow to
    v0/e1/e2) and fetched in one gather. Returns (hit, surf) with the
    exact semantics of intersect_v + hit_surface_v.
    """
    backend = _pick_backend(scene, backend)
    sg = jax.lax.stop_gradient
    if backend == "pallas":
        from fovtrace.kernels import pallas_isect

        raw = pallas_isect.intersect_pallas(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max))
    elif backend == "bvh":
        from fovtrace.kernels import bvh_traverse

        raw = bvh_traverse.intersect_bvh(
            sg(scene), sg(vec.to_rows(ro)), sg(vec.to_rows(rd)),
            sg(t_min), sg(t_max), packet)
    else:
        raw = intersect_brute(sg(scene), sg(vec.to_rows(ro)),
                              sg(vec.to_rows(rd)), sg(t_min), sg(t_max))

    tri = sg(jnp.maximum(raw.tri, 0))
    at = getattr(scene, "tri_attr", None)
    if at is None:
        gn0 = jnp.cross(scene.e1, scene.e2)
        gn0 = gn0 / jnp.maximum(
            jnp.linalg.norm(gn0, axis=-1, keepdims=True), 1e-20)
        at = jnp.concatenate(
            [scene.n0, scene.n1, scene.n2, gn0,
             scene.uv0, scene.uv1, scene.uv2,
             scene.mat_id[:, None].astype(jnp.float32)], axis=1)
    comb = jnp.concatenate(
        [scene.v0, scene.e1, scene.e2, at[:, :19]], axis=1)  # [T, 28]
    g = comb[tri].T                                          # [28, N]
    gv = lambda r: Vec3(g[r], g[r + 1], g[r + 2])

    # ---- refine (Moller-Trumbore on the winner, differentiable) ------
    v0, e1, e2 = gv(0), gv(3), gv(6)
    pvec = vec.cross(rd, e2)
    det = vec.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
    tvec = ro - v0
    u = vec.dot(tvec, pvec) * inv_det
    qvec = vec.cross(tvec, e1)
    v = vec.dot(rd, qvec) * inv_det
    t = vec.dot(e2, qvec) * inv_det
    valid = raw.tri >= 0
    hit = Hit(
        t=jnp.where(valid, t, BIG_T),
        tri=raw.tri,
        u=jnp.where(valid, u, 0.0),
        v=jnp.where(valid, v, 0.0),
    )

    # ---- surface attributes (hit_surface_v math on the same rows) ----
    w = 1.0 - hit.u - hit.v
    n0, n1, n2 = gv(9), gv(12), gv(15)
    gn = gv(18)
    n_sh = vec.normalize(n0 * w + n1 * hit.u + n2 * hit.v)
    u_tex = g[21] * w + g[23] * hit.u + g[25] * hit.v
    v_tex = g[22] * w + g[24] * hit.u + g[26] * hit.v
    mat_id = jnp.where(valid, g[27].astype(jnp.int32), -1)
    t_safe = jnp.where(valid, hit.t, 0.0)
    point = ro + rd * t_safe

    safe_mat = jnp.maximum(mat_id, 0)
    kd, tex_id_f = material_lookup_v(
        scene.materials, safe_mat, [("kd", 3), ("texture_id", 1)])
    tex_id = tex_id_f.astype(jnp.int32)
    ntex, th, tw = (scene.textures.shape[0], scene.textures.shape[1],
                    scene.textures.shape[2])
    if ntex > 1 or th * tw > 1:
        tx = jnp.clip((u_tex % 1.0) * tw, 0, tw - 1).astype(jnp.int32)
        ty = jnp.clip((v_tex % 1.0) * th, 0, th - 1).astype(jnp.int32)
        ti = jnp.clip(tex_id, 0, ntex - 1)
        flat = scene.textures.reshape(-1, 3)
        texel_rows = flat[(ti * th + ty) * tw + tx].T
        texel = Vec3(texel_rows[0], texel_rows[1], texel_rows[2])
        kd = vec.where(tex_id >= 0, kd * texel, kd)

    surf = {
        "point": point,
        "normal": n_sh,
        "gnormal": gn,
        "u_tex": u_tex,
        "v_tex": v_tex,
        "mat_id": mat_id,
        "kd": kd,
        "t_safe": t_safe,
    }
    return hit, surf


def hit_surface(scene, ro, rd, hit: Hit):
    """Row-API wrapper over hit_surface_v (Vec3 -> [N,3], uv -> [N,2])."""
    s = hit_surface_v(scene, vec.from_rows(ro), vec.from_rows(rd), hit)
    return {
        "point": vec.to_rows(s["point"]),
        "normal": vec.to_rows(s["normal"]),
        "gnormal": vec.to_rows(s["gnormal"]),
        "uv": jnp.stack([s["u_tex"], s["v_tex"]], axis=-1),
        "mat_id": s["mat_id"],
        "kd": vec.to_rows(s["kd"]),
        "t_safe": s["t_safe"],
    }
