"""Ray / triangle-soup intersection.

TPU-native replacement for OptiX's `rtTrace` + the reference's
intersection programs (`REF/cuda/triangle_mesh.cu:59-106` indexed-triangle
intersect, `intersection_refinement.h:36-99` refined secondary-ray
origins). There are no RT cores on TPU, so intersection is a dense
vector problem: batches of rays against blocks of triangles on the VPU,
with the closest-hit reduction fused in.

Backends:
  - `intersect_brute`      pure-XLA scan over triangle blocks (any device)
  - `intersect_brute_pallas` Pallas TPU kernel: ray blocks in VMEM, scan
    over triangle blocks, hit record reduced in registers
  - BVH packet traversal lives in `fovtrace.kernels.bvh_traverse`

All functions take flat [N,3] ray arrays and a `Scene`; callers reshape
pixel grids. Hit triangle ids are discrete and treated as constants under
differentiation (`stop_gradient`); positions/shading stay differentiable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fovtrace.core import mathx

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
def refine_hit(scene, ro, rd, hit: Hit) -> Hit:
    """Recompute (t, u, v) differentiably for the already-found triangle.

    Traversal is discrete (and reverse-mode can't cross its while_loop),
    so the kernels run under stop_gradient and this O(N) Moller-Trumbore
    recompute restores exact gradients w.r.t. rays and vertices — the
    backward pass never touches the acceleration structure. (This also
    shrinks the brute-force backward from O(N*T) to O(N).)
    """
    tri = jax.lax.stop_gradient(jnp.maximum(hit.tri, 0))
    v0 = scene.v0[tri]
    e1 = scene.e1[tri]
    e2 = scene.e2[tri]
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
    tvec = ro - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = hit.tri >= 0
    return Hit(
        t=jnp.where(valid, t, BIG_T),
        tri=hit.tri,
        u=jnp.where(valid, u, 0.0),
        v=jnp.where(valid, v, 0.0),
    )


def _pick_backend(scene, backend: str) -> str:
    """auto: the Pallas cluster kernel on TPU (pallas_isect — the fast
    path); brute force elsewhere (carry-free, so it stays valid under
    grad-of-shard_map, which the packet-BVH while_loop does not — the
    'bvh' backend remains available explicitly)."""
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "brute"


def intersect(scene, ro, rd, t_min, t_max, backend: str = "auto",
              packet: int = 1024) -> Hit:
    """Closest-hit dispatcher. Always differentiable via refine_hit."""
    backend = _pick_backend(scene, backend)
    sg = jax.lax.stop_gradient
    if backend == "pallas":
        from fovtrace.kernels import pallas_isect

        raw = pallas_isect.intersect_pallas(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max))
    elif backend == "bvh":
        from fovtrace.kernels import bvh_traverse

        raw = bvh_traverse.intersect_bvh(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max), packet
        )
    else:
        raw = intersect_brute(sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max))
    return refine_hit(scene, ro, rd, raw)


def occlusion(scene, ro, rd, t_min, t_max, backend: str = "auto",
              packet: int = 1024) -> jnp.ndarray:
    """Shadow-attenuation dispatcher. Visibility is treated as locally
    constant under differentiation (standard differentiable-rendering
    convention for binary occlusion; SURVEY.md §7 hard part #3)."""
    backend = _pick_backend(scene, backend)
    sg = jax.lax.stop_gradient
    if backend == "pallas":
        from fovtrace.kernels import pallas_isect

        return sg(pallas_isect.occlusion_pallas(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max)))
    if backend == "bvh":
        from fovtrace.kernels import bvh_traverse

        return sg(bvh_traverse.occlusion_bvh(
            sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max), packet))
    return sg(occlusion_brute(sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max)))


# --------------------------------------------------------------- shading IO
def onehot_rows(ids: jnp.ndarray, m: int) -> jnp.ndarray:
    """[N, M] f32 one-hot of clamped int ids — the TPU-fast way to read
    small tables: `onehot @ table` is one MXU matmul, whereas `table[ids]`
    is a scalar-unit gather. Differentiable w.r.t. the table."""
    return (ids[:, None] == jnp.arange(m, dtype=ids.dtype)[None, :]).astype(
        jnp.float32
    )


def material_lookup(materials, safe_mat: jnp.ndarray, columns) -> list:
    """Fetch several per-material columns with ONE one-hot matmul.

    columns: list of (name, width). Returns the corresponding [N, width]
    arrays (width 1 -> [N]). Gradients flow into the material table.
    """
    m = materials.kind.shape[0]
    parts = []
    for name, width in columns:
        col = getattr(materials, name)
        col = col.astype(jnp.float32)
        parts.append(col[:, None] if col.ndim == 1 else col)
    table = jnp.concatenate(parts, axis=1)           # [M, sum(widths)]
    vals = onehot_rows(safe_mat, m) @ table          # [N, sum]
    out = []
    off = 0
    for name, width in columns:
        sl = vals[:, off:off + width]
        out.append(sl[:, 0] if width == 1 else sl)
        off += width
    return out


def hit_surface(scene, ro, rd, hit: Hit):
    """Interpolate surface attributes at hits.

    Returns dict with: point [N,3] (refined + offset-ready), shading normal,
    geometric normal, uv [N,2], mat_id [N], kd [N,3] (albedo incl. texture).
    Matches triangle_mesh.cu:59-106 barycentric interpolation; the hit
    point is recomputed as o + t*d (the 'refined' front hit surrogate).
    Triangle ids are stop-gradiented; positions remain differentiable
    through t, u, v.

    Fast path: ONE packed row gather from scene.tri_attr (built by
    with_pack) + a one-hot matmul for material albedo, instead of ~10
    scattered XLA gathers (per-vertex attributes are compile-time
    constants of the scene on this path; vertex-attribute gradients need
    the fallback path).
    """
    tri = jax.lax.stop_gradient(jnp.maximum(hit.tri, 0))
    u = hit.u[:, None]
    v = hit.v[:, None]
    w = 1.0 - u - v

    if getattr(scene, "tri_attr", None) is not None:
        attr = scene.tri_attr[tri]                   # [N, 24] single gather
        n_sh = w * attr[:, 0:3] + u * attr[:, 3:6] + v * attr[:, 6:9]
        n_sh = mathx.normalize(n_sh)
        gn = attr[:, 9:12]
        uv = w * attr[:, 12:14] + u * attr[:, 14:16] + v * attr[:, 16:18]
        mat_id_f = attr[:, 18]
        mat_id = jnp.where(hit.tri >= 0,
                           mat_id_f.astype(jnp.int32), -1)
    else:
        n_sh = w * scene.n0[tri] + u * scene.n1[tri] + v * scene.n2[tri]
        n_sh = mathx.normalize(n_sh)
        gn = mathx.normalize(jnp.cross(scene.e1[tri], scene.e2[tri]))
        uv = w * scene.uv0[tri] + u * scene.uv1[tri] + v * scene.uv2[tri]
        mat_id = jnp.where(hit.tri >= 0, scene.mat_id[tri], -1)

    # miss lanes carry t = BIG_T; clamp them so downstream dead-lane math
    # (light distance, Beer's law) stays finite — otherwise inf intermediates
    # poison the backward pass through jnp.where (0 * inf = NaN).
    t_safe = jnp.where(hit.valid, hit.t, 0.0)
    point = ro + t_safe[:, None] * rd

    safe_mat = jnp.maximum(mat_id, 0)
    kd, tex_id_f = material_lookup(
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
        tx = jnp.clip((uv[:, 0] % 1.0) * tw, 0, tw - 1).astype(jnp.int32)
        ty = jnp.clip((uv[:, 1] % 1.0) * th, 0, th - 1).astype(jnp.int32)
        texel = scene.textures[jnp.clip(tex_id, 0, ntex - 1), ty, tx]
        kd = jnp.where(tex_id[:, None] >= 0, kd * texel, kd)

    return {
        "point": point,
        "normal": n_sh,
        "gnormal": gn,
        "uv": uv,
        "mat_id": mat_id,
        "kd": kd,
        "t_safe": t_safe,
    }
