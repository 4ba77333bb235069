"""Independent numpy reference renderer for allclose parity checks.

Implements the same rendering math as fovtrace.render.shade but in plain
numpy with per-ray Python-level logic — an independent oracle for the
BASELINE config-1 requirement ("box scene, uniform full-res path trace,
1 bounce, CPU ref parity"). The RNG draw order mirrors shade() exactly
(both implement the reference's tea/LCG streams), so images match to
float32 tolerance, not just statistically.
"""

from __future__ import annotations

import numpy as np

BIG_T = 1e30
DET_EPS = 1e-12


# ----------------------------------------------------------------- rng
def tea(v0, v1, rounds=16):
    v0 = np.asarray(v0, np.uint32).copy()
    v1 = np.asarray(v1, np.uint32).copy()
    s = np.zeros_like(v0)
    delta = np.uint32(0x9E3779B9)
    k = [np.uint32(x) for x in (0xA341316C, 0xC8013EA4, 0xAD90777D, 0x7E95761E)]
    with np.errstate(over="ignore"):
        for _ in range(rounds):
            s = s + delta
            v0 = v0 + (((v1 << np.uint32(4)) + k[0]) ^ (v1 + s) ^ ((v1 >> np.uint32(5)) + k[1]))
            v1 = v1 + (((v0 << np.uint32(4)) + k[2]) ^ (v0 + s) ^ ((v0 >> np.uint32(5)) + k[3]))
    return v0


def rnd(state):
    with np.errstate(over="ignore"):
        state = state * np.uint32(1664525) + np.uint32(1013904223)
    val = (state & np.uint32(0x00FFFFFF)).astype(np.float32) / np.float32(0x01000000)
    return val, state


# ------------------------------------------------------------- geometry
def normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def intersect_all(scene_np, ro, rd, t_min, t_max):
    """Closest hit of [N] rays against all triangles. Dense numpy."""
    v0, e1, e2 = scene_np["v0"], scene_np["e1"], scene_np["e2"]
    o = ro[:, None, :]
    d = rd[:, None, :]
    pvec = np.cross(d, e2[None])
    det = np.sum(e1[None] * pvec, -1)
    inv_det = np.where(np.abs(det) > DET_EPS, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o - v0[None]
    u = np.sum(tvec * pvec, -1) * inv_det
    qvec = np.cross(tvec, e1[None])
    v = np.sum(d * qvec, -1) * inv_det
    t = np.sum(e2[None] * qvec, -1) * inv_det
    hit = (
        (np.abs(det) > DET_EPS) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > t_min[:, None]) & (t < t_max[:, None])
    )
    t = np.where(hit, t, BIG_T).astype(np.float32)
    best = np.argmin(t, axis=1)
    rows = np.arange(len(ro))
    bt = t[rows, best]
    tri = np.where(bt < BIG_T, best, -1).astype(np.int32)
    return bt, tri, u[rows, best].astype(np.float32), v[rows, best].astype(np.float32)


def occlusion(scene_np, ro, rd, t_min, t_max):
    """Shadow attenuation [N,3]: opaque hit -> 0, refractive hit ->
    fresnel-attenuated transparency product (matches occlusion_brute)."""
    v0, e1, e2 = scene_np["v0"], scene_np["e1"], scene_np["e2"]
    o = ro[:, None, :]
    d = rd[:, None, :]
    pvec = np.cross(d, e2[None])
    det = np.sum(e1[None] * pvec, -1)
    inv_det = np.where(np.abs(det) > DET_EPS, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o - v0[None]
    u = np.sum(tvec * pvec, -1) * inv_det
    qvec = np.cross(tvec, e1[None])
    v = np.sum(d * qvec, -1) * inv_det
    t = np.sum(e2[None] * qvec, -1) * inv_det
    hit = (
        (np.abs(det) > DET_EPS) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > t_min[:, None]) & (t < t_max[:, None])
        & (scene_np["mat_id"][None, :] >= 0)
    )
    kind = scene_np["kind_per_tri"]
    transparent = kind == 2
    gn = normalize(np.cross(e1, e2))
    ndi = np.abs(np.sum(d * gn[None], -1))
    c5 = np.clip(1.0 - ndi, 0, 1) ** 5
    sa = scene_np["shadow_att_per_tri"]
    trans = 1.0 - ((1.0 - sa[None]) + sa[None] * c5[..., None])
    factor = np.where(
        hit[..., None],
        np.where(transparent[None, :, None], np.clip(trans, 0, 1), 0.0),
        1.0,
    )
    return np.prod(factor, axis=1).astype(np.float32)


def scene_to_np(scene):
    mats = scene.materials
    mat_id = np.asarray(scene.mat_id)
    safe = np.maximum(mat_id, 0)
    return {
        "v0": np.asarray(scene.v0), "e1": np.asarray(scene.e1),
        "e2": np.asarray(scene.e2),
        "n0": np.asarray(scene.n0), "n1": np.asarray(scene.n1),
        "n2": np.asarray(scene.n2),
        "uv0": np.asarray(scene.uv0), "uv1": np.asarray(scene.uv1),
        "uv2": np.asarray(scene.uv2),
        "mat_id": mat_id,
        "kind": np.asarray(mats.kind), "kd": np.asarray(mats.kd),
        "ks": np.asarray(mats.ks), "phong_exp": np.asarray(mats.phong_exp),
        "reflectivity_n": np.asarray(mats.reflectivity_n),
        "ior": np.asarray(mats.ior),
        "extinction": np.asarray(mats.extinction),
        "refraction_color": np.asarray(mats.refraction_color),
        "reflection_color": np.asarray(mats.reflection_color),
        "fres_exp": np.asarray(mats.fresnel_exponent),
        "fres_min": np.asarray(mats.fresnel_minimum),
        "fres_max": np.asarray(mats.fresnel_maximum),
        "texture_id": np.asarray(mats.texture_id),
        "textures": np.asarray(scene.textures),
        "kind_per_tri": np.where(mat_id >= 0, np.asarray(mats.kind)[safe], -1),
        "shadow_att_per_tri": np.where(
            (mat_id >= 0)[:, None],
            np.asarray(mats.shadow_attenuation)[safe],
            np.ones((1, 3), np.float32),
        ).astype(np.float32),
        "light_corner": np.asarray(scene.light.corner),
        "light_v1": np.asarray(scene.light.v1),
        "light_v2": np.asarray(scene.light.v2),
        "light_normal": np.asarray(scene.light.normal),
        "light_emission": np.asarray(scene.light.emission),
        "envmap": np.asarray(scene.envmap),
    }


def envmap_lookup(envmap, dirs, scale=2.0):
    theta = np.arctan2(dirs[..., 0], dirs[..., 2])
    phi = np.pi * 0.5 - np.arccos(np.clip(dirs[..., 1], -1, 1))
    u = (theta + np.pi) * (0.5 / np.pi)
    v = 0.5 * (1.0 + np.sin(phi))
    h, w = envmap.shape[:2]
    fx = u * (w - 1)
    fy = (1.0 - v) * (h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    return (
        envmap[y0, x0] * (1 - wx) * (1 - wy)
        + envmap[y0, x1] * wx * (1 - wy)
        + envmap[y1, x0] * (1 - wx) * wy
        + envmap[y1, x1] * wx * wy
    ) * scale


def surface(sc, ro, rd, t, tri, u, v):
    tri_s = np.maximum(tri, 0)
    uu = u[:, None]
    vv = v[:, None]
    ww = 1.0 - uu - vv
    n = normalize(ww * sc["n0"][tri_s] + uu * sc["n1"][tri_s] + vv * sc["n2"][tri_s])
    gn = normalize(np.cross(sc["e1"][tri_s], sc["e2"][tri_s]))
    uv = ww * sc["uv0"][tri_s] + uu * sc["uv1"][tri_s] + vv * sc["uv2"][tri_s]
    point = ro + t[:, None] * rd
    mat = np.where(tri >= 0, sc["mat_id"][tri_s], -1)
    safe = np.maximum(mat, 0)
    kd = sc["kd"][safe]
    tex_id = sc["texture_id"][safe]
    ntex, th, tw = sc["textures"].shape[:3]
    tx = np.clip((uv[:, 0] % 1.0) * tw, 0, tw - 1).astype(int)
    ty = np.clip((uv[:, 1] % 1.0) * th, 0, th - 1).astype(int)
    texel = sc["textures"][np.clip(tex_id, 0, ntex - 1), ty, tx]
    kd = np.where(tex_id[:, None] >= 0, kd * texel, kd)
    return point, n, gn, mat, kd


def nee(sc, point, normal, kd, seeds, eps, ks=None, pexp=None, wo=None):
    """One light sample + one shadow ray -> (diffuse, phong) contributions."""
    z1, seeds = rnd(seeds)
    z2, seeds = rnd(seeds)
    lp = sc["light_corner"] + sc["light_v1"] * z1[:, None] + sc["light_v2"] * z2[:, None]
    to_l = lp - point
    ldist = np.linalg.norm(to_l, axis=-1)
    l = to_l / np.maximum(ldist[:, None], 1e-20)
    ndl = np.sum(normal * l, -1)
    lndl = np.sum(sc["light_normal"] * l, -1)
    facing = (ndl > 0) & (lndl > 0)
    atten = occlusion(sc, point + normal * eps, l,
                      np.full_like(ldist, eps), ldist - eps)
    area = np.linalg.norm(np.cross(sc["light_v1"], sc["light_v2"]))
    weight = ndl * lndl * area / (np.pi * ldist * ldist)
    lc = sc["light_emission"] * weight[:, None] * atten
    diffuse_c = kd * lc
    phong_c = kd * ndl[:, None] * lc
    h = normalize(l - wo)
    ndh = np.sum(normal * h, -1)
    spec = np.where(ndh[:, None] > 0,
                    ks * lc * (np.maximum(ndh, 1e-9) ** pexp)[:, None], 0.0)
    phong_c = phong_c + spec
    diffuse_c = np.where(facing[:, None], diffuse_c, 0.0).astype(np.float32)
    phong_c = np.where(facing[:, None], phong_c, 0.0).astype(np.float32)
    return diffuse_c, phong_c, seeds


def onb_frisvad(n):
    s = np.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t = np.concatenate([1.0 + s * n[..., 0:1] ** 2 * a, s * b, -s * n[..., 0:1]], -1)
    bt = np.concatenate([b, s + n[..., 1:2] ** 2 * a, -n[..., 1:2]], -1)
    return t, bt


def np_refract(i, n, eta_ratio):
    cosi = np.sum(i * n, -1, keepdims=True)
    entering = cosi < 0
    nn = np.where(entering, n, -n)
    eta = np.where(entering, 1.0 / eta_ratio, eta_ratio)
    ci = np.abs(cosi)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    tir = (k < 0)[..., 0]
    t = eta * i + (eta * ci - np.sqrt(np.maximum(k, 0))) * nn
    t = np.where(tir[..., None], 0.0, normalize(t))
    return t, tir


def shade_np(scene, ro, rd, seeds, config):
    """Mirror of fovtrace.render.shade.shade in numpy (same draw order)."""
    sc = scene_to_np(scene)
    n = len(ro)
    result = np.zeros((n, 3), np.float32)
    throughput = np.ones((n, 3), np.float32)
    alive = np.ones(n, bool)
    origin = ro.astype(np.float32).copy()
    direction = rd.astype(np.float32).copy()
    gi_depth = np.zeros(n, np.int32)
    eps = config.scene_epsilon

    lum_w = np.array([0.30, 0.59, 0.11], np.float32)

    for bounce in range(config.max_depth):
        t, tri, u, v = intersect_all(sc, origin, direction,
                                     np.full(n, eps, np.float32),
                                     np.full(n, BIG_T, np.float32))
        valid = tri >= 0
        missed = alive & ~valid
        env = envmap_lookup(sc["envmap"], direction, config.envmap_scale)
        result = np.where(missed[:, None], result + throughput * env, result)

        point, n_sh0, gn, mat, kd = surface(sc, origin, direction, t, tri, u, v)
        n_sh = np.where(np.sum(gn * -direction, -1, keepdims=True) < 0, -n_sh0, n_sh0)
        safe = np.maximum(mat, 0)
        kind = np.where(mat >= 0, sc["kind"][safe], -1)
        live_hit = alive & valid

        direct_d, direct_r, seeds = nee(sc, point, n_sh, kd, seeds, eps,
                                        ks=sc["ks"][safe],
                                        pexp=sc["phong_exp"][safe],
                                        wo=direction)
        refl_n = sc["reflectivity_n"][safe]
        cos_i = np.maximum(-np.sum(n_sh * direction, -1), 0)
        r_schlick = refl_n + (1 - refl_n) * np.clip(1 - cos_i[:, None], 0, 1) ** 5

        ior = sc["ior"][safe]
        t_dir, tir = np_refract(direction, n_sh0, ior[:, None])
        cos_n = np.sum(direction * n_sh0, -1)
        cos_theta = np.where(cos_n < 0, -cos_n, np.sum(t_dir * n_sh0, -1))
        c = np.clip(1 - cos_theta, 0, 1)
        fres = np.clip(
            sc["fres_min"][safe]
            + (sc["fres_max"][safe] - sc["fres_min"][safe]) * c ** sc["fres_exp"][safe],
            0, 1,
        )
        fres = np.where(tir, 1.0, fres)
        exiting = cos_n > 0
        beer = np.where(exiting[:, None], np.exp(sc["extinction"][safe] * t[:, None]), 1.0)
        zr, seeds = rnd(seeds)
        choose_refl = zr < fres
        refl_dir0 = direction - 2 * np.sum(direction * n_sh0, -1, keepdims=True) * n_sh0
        refr_dir = np.where(choose_refl[:, None], refl_dir0, t_dir)
        refr_weight = np.where(choose_refl[:, None], sc["reflection_color"][safe],
                               sc["refraction_color"][safe]) * beer * kd

        is_diff = live_hit & (kind == 0)
        is_refl = live_hit & (kind == 1)
        is_refr = live_hit & (kind == 2)

        direct = np.where(is_diff[:, None], direct_d, 0) + np.where(
            is_refl[:, None], direct_r, 0)
        result = result + throughput * direct

        z1, seeds = rnd(seeds)
        z2, seeds = rnd(seeds)
        r = np.sqrt(z1)
        phi = 2 * np.pi * z2
        local = np.stack([r * np.cos(phi), r * np.sin(phi),
                          np.sqrt(np.maximum(0, 1 - z1))], -1)
        tgt, btg = onb_frisvad(n_sh)
        gi_dir = local[:, 0:1] * tgt + local[:, 1:2] * btg + local[:, 2:3] * n_sh
        mirror = direction - 2 * np.sum(direction * n_sh, -1, keepdims=True) * n_sh

        new_dir = np.where(is_refr[:, None], refr_dir,
                           np.where(is_refl[:, None], mirror, gi_dir))
        new_thr = throughput * np.where(
            is_refr[:, None], refr_weight,
            np.where(is_refl[:, None], r_schlick, kd))

        importance = np.sum(np.abs(new_thr) * lum_w, -1)
        diff_go = is_diff & (gi_depth < config.diffuse_max_depth - 1)
        spec_go = (is_refl | is_refr) & (importance > config.importance_cutoff)
        go = diff_go | spec_go

        side = np.where(np.sum(new_dir * gn, -1, keepdims=True) >= 0, 1.0, -1.0)
        new_origin = point + gn * side * eps

        origin = np.where(go[:, None], new_origin, origin)
        direction = np.where(go[:, None], new_dir, direction)
        throughput = np.where(go[:, None], new_thr, throughput)
        gi_depth = np.where(is_diff & go, gi_depth + 1, gi_depth)
        alive = go

    return result
