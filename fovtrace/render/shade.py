"""Wavefront path tracing: materials as vectorized branches, not recursion.

TPU-native re-design of the reference's recursive OptiX closest-hit
programs (`diffuse.cu:65-144` NEE + cosine GI, `reflection.cu:71-145`
phong + Schlick mirror, `refraction.cu:59-141` Whitted glass with Beer's
law, `gradientbg.cu:57-67` HDR envmap miss). OptiX recurses inside
closest-hit shaders; on TPU we run a bounded bounce loop over the whole
ray front: every iteration intersects all live rays once, evaluates all
three material models densely, and selects by material id. Shapes are
static; control flow is data-independent (XLA-friendly).

Documented deviations from the reference's quirks (SURVEY.md §7 "hard
parts" #5, #7 — parity target is the *intended* behavior):
  - The reference's diffuse GI adds the child's raw `reflectance`
    (child_Kd * child_direct) unweighted; we use standard cosine-weighted
    path throughput (parent Kd multiplies the child's full radiance).
  - `refraction.cu` recurses into BOTH refraction and reflection children
    (a ray tree); we use Fresnel-importance single-successor sampling
    (the strategy of the reference's own unused `glass.cu:100-116`),
    which keeps the ray front SoA-shaped and is unbiased in expectation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fovtrace.core import mathx, rng
from fovtrace.kernels import intersect as isect
from fovtrace.scene.scene import MATL_DIFFUSE, MATL_REFLECTION, MATL_REFRACTION


def envmap_lookup(envmap: jnp.ndarray, dirs: jnp.ndarray, scale: float = 2.0):
    """Lat-long environment lookup (gradientbg.cu:57-67).

    theta = atan2(dir.x, dir.z); phi = pi/2 - acos(dir.y)
    u = (theta + pi) / 2pi; v = 0.5 * (1 + sin(phi));  radiance *= 2.
    Bilinear lookup keeps the map differentiable.
    """
    theta = jnp.arctan2(dirs[..., 0], dirs[..., 2])
    phi = jnp.pi * 0.5 - jnp.arccos(jnp.clip(dirs[..., 1], -1.0, 1.0))
    u = (theta + jnp.pi) * (0.5 / jnp.pi)
    v = 0.5 * (1.0 + jnp.sin(phi))
    h, w = envmap.shape[0], envmap.shape[1]
    fx = u * (w - 1)
    fy = (1.0 - v) * (h - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    c = (
        envmap[y0, x0] * (1 - wx) * (1 - wy)
        + envmap[y0, x1] * wx * (1 - wy)
        + envmap[y1, x0] * (1 - wx) * wy
        + envmap[y1, x1] * wx * wy
    )
    return c * scale


def nee_direct(scene, point, normal, kd, seeds, config,
               ks=None, phong_exp=None, wo=None, enabled=None):
    """Next-event estimation against the parallelogram area light.

    One light sample + ONE shadow ray per hit (matching the reference,
    where exactly one closest-hit program runs per hit), producing both
    the diffuse contribution (diffuse.cu:92-119: weight = nDl * LnDl * A /
    (pi * d^2), contrib = Kd * Lc) and the phong contribution
    (reflection.cu:89-126: Kd*nDl*Lc + Ks*(n.H)^exp * Lc); the caller
    selects per material kind.

    Returns (diffuse_radiance [N,3], phong_radiance [N,3], new_seeds).
    """
    light = scene.light
    z1, seeds = rng.rnd(seeds)
    z2, seeds = rng.rnd(seeds)
    light_pos = light.corner + light.v1 * z1[:, None] + light.v2 * z2[:, None]
    to_l = light_pos - point
    ldist = mathx.length(to_l)
    l = to_l / ldist[:, None]
    ndl = jnp.sum(normal * l, axis=-1)
    lndl = jnp.sum(light.normal * l, axis=-1)
    facing = (ndl > 0.0) & (lndl > 0.0)

    shadow_tmax = ldist - config.scene_epsilon
    if enabled is not None:
        # disabled lanes (misses / dead rays) cost nothing: t_max = -1
        # fails every slab test in the occlusion kernel
        shadow_tmax = jnp.where(enabled & facing, shadow_tmax, -1.0)
    atten = isect.occlusion(
        scene, point + normal * config.scene_epsilon, l,
        config.scene_epsilon, shadow_tmax,
    )
    area = light.area
    weight = ndl * lndl * area / (jnp.pi * ldist * ldist)
    lc = light.emission * weight[:, None] * atten

    diffuse_contrib = kd * lc
    phong_contrib = kd * ndl[:, None] * lc
    h = mathx.normalize(l - wo)
    ndh = jnp.sum(normal * h, axis=-1)
    spec = jnp.where(
        ndh[:, None] > 0.0,
        ks * lc * (jnp.maximum(ndh, 1e-9) ** phong_exp)[:, None],
        0.0,
    )
    phong_contrib = phong_contrib + spec

    diffuse_contrib = jnp.where(facing[:, None], diffuse_contrib, 0.0)
    phong_contrib = jnp.where(facing[:, None], phong_contrib, 0.0)
    return diffuse_contrib, phong_contrib, seeds


def shade(scene, ro, rd, seeds, config):
    """Trace radiance for a flat front of rays.

    ro, rd: [N,3]; seeds: [N] uint32 per-ray streams.
    Returns (radiance [N,3], aux dict with first-hit point/normal/depth).

    Wavefront COMPACTION between bounces: after each bounce the surviving
    rays (diffuse GI continuations + specular above the importance
    cutoff) are stream-compacted to a shrinking static budget, so later
    bounces trace dense fronts instead of mostly-dead lanes — the TPU
    analog of the reference's warpSort compaction, applied per bounce.
    Budgets are halves of the previous width (floor 1024); overflow rays
    beyond a budget are dropped (they are below-cutoff tails).
    """
    n = ro.shape[0]
    mats = scene.materials

    result = jnp.zeros((n, 3), jnp.float32)
    pix = jnp.arange(n, dtype=jnp.int32)   # original ray slot per lane
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    origin = ro
    direction = rd
    first_point = jnp.zeros((n, 3), jnp.float32)
    first_normal = jnp.zeros((n, 3), jnp.float32)
    first_t = jnp.full((n,), isect.BIG_T, jnp.float32)
    gi_depth = jnp.zeros((n,), jnp.int32)   # diffuse bounce counter
    rays_traced = jnp.zeros((), jnp.int32)  # closest-hit + shadow rays

    for bounce in range(config.max_depth):
        # dead lanes get t_max = -1: they fail every slab test, so whole
        # dead blocks are culled by the kernel's liveness schedule
        t_max = jnp.where(alive, isect.BIG_T, -1.0)
        hit = isect.intersect(
            scene, origin, direction, config.scene_epsilon, t_max
        )
        missed = alive & ~hit.valid
        env = envmap_lookup(scene.envmap, direction, config.envmap_scale)
        result = result.at[pix].add(
            jnp.where(missed[:, None], throughput * env, 0.0), mode="drop"
        )

        surf = isect.hit_surface(scene, origin, direction, hit)
        point = surf["point"]
        n_sh = mathx.faceforward(surf["normal"], -direction, surf["gnormal"])
        kd = surf["kd"]
        mat_id = surf["mat_id"]
        safe_mat = jnp.maximum(mat_id, 0)

        # ALL per-material parameters in ONE one-hot matmul (XLA gathers
        # from small tables are scalar-unit-bound on TPU; a [N,M]x[M,K]
        # matmul is ~free and keeps the table differentiable)
        (kind_f, ks, pexp, refl_n, ior, extinction, refr_color, refl_color,
         fres_exp, fres_min, fres_max) = isect.material_lookup(
            mats, safe_mat,
            [("kind", 1), ("ks", 3), ("phong_exp", 1),
             ("reflectivity_n", 3), ("ior", 1), ("extinction", 3),
             ("refraction_color", 3), ("reflection_color", 3),
             ("fresnel_exponent", 1), ("fresnel_minimum", 1),
             ("fresnel_maximum", 1)],
        )
        kind = jnp.where(mat_id >= 0, kind_f.astype(jnp.int32), -1)

        live_hit = alive & hit.valid
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32)) + \
            jnp.sum(live_hit.astype(jnp.int32))
        if bounce == 0:
            first_point = jnp.where(hit.valid[:, None], point, first_point)
            first_normal = jnp.where(hit.valid[:, None], n_sh, first_normal)
            first_t = jnp.where(hit.valid, hit.t, first_t)

        # ---------- NEE direct lighting (diffuse + phong variants) -----
        direct_d, direct_r, seeds = nee_direct(
            scene, point, n_sh, kd, seeds, config,
            ks=ks, phong_exp=pexp, wo=direction, enabled=live_hit,
        )
        cos_i = jnp.maximum(-jnp.sum(n_sh * direction, axis=-1), 0.0)
        r_schlick = mathx.schlick_rgb(cos_i[:, None], refl_n)

        # ---------- refraction: fresnel split, single successor --------
        t_dir, tir = mathx.refract(direction, surf["normal"], ior[:, None])
        cos_n = jnp.sum(direction * surf["normal"], axis=-1)
        cos_theta = jnp.where(cos_n < 0.0, -cos_n,
                              jnp.sum(t_dir * surf["normal"], axis=-1))
        fres = mathx.fresnel_schlick(cos_theta, fres_exp, fres_min, fres_max)
        fres = jnp.where(tir, 1.0, fres)
        exiting = cos_n > 0.0
        beer = jnp.where(
            exiting[:, None],
            jnp.exp(extinction * surf["t_safe"][:, None]),
            1.0,
        )
        zr, seeds = rng.rnd(seeds)
        choose_refl = zr < fres
        refr_dir = jnp.where(choose_refl[:, None],
                             mathx.reflect(direction, surf["normal"]), t_dir)
        refr_weight = jnp.where(
            choose_refl[:, None], refl_color, refr_color,
        ) * beer * kd

        # ---------- select by material kind ----------------------------
        is_diff = live_hit & (kind == MATL_DIFFUSE)
        is_refl = live_hit & (kind == MATL_REFLECTION)
        is_refr = live_hit & (kind == MATL_REFRACTION)

        direct = jnp.where(is_diff[:, None], direct_d, 0.0) + jnp.where(
            is_refl[:, None], direct_r, 0.0
        )
        result = result.at[pix].add(throughput * direct, mode="drop")

        # continuation ray
        z1, seeds = rng.rnd(seeds)
        z2, seeds = rng.rnd(seeds)
        gi_dir = mathx.to_world(mathx.cosine_sample_hemisphere(z1, z2), n_sh)
        mirror_dir = mathx.reflect(direction, n_sh)

        new_dir = jnp.where(
            is_refr[:, None], refr_dir,
            jnp.where(is_refl[:, None], mirror_dir, gi_dir),
        )
        new_thr = throughput * jnp.where(
            is_refr[:, None], refr_weight,
            jnp.where(is_refl[:, None], r_schlick, kd),
        )

        # survival: diffuse limited by diffuse_max_depth; specular by
        # importance cutoff (reflection.cu:130-136, refraction.cu:86-97)
        importance = mathx.luminance(jnp.abs(new_thr))
        diff_go = is_diff & (gi_depth < config.diffuse_max_depth - 1)
        spec_go = (is_refl | is_refr) & (importance > config.importance_cutoff)
        go = diff_go | spec_go

        # offset the new origin off the surface (intersection_refinement.h)
        side = jnp.where(
            jnp.sum(new_dir * surf["gnormal"], axis=-1, keepdims=True) >= 0.0,
            1.0, -1.0,
        )
        new_origin = point + surf["gnormal"] * side * config.scene_epsilon

        origin = jnp.where(go[:, None], new_origin, origin)
        direction = jnp.where(go[:, None], new_dir, direction)
        throughput = jnp.where(go[:, None], new_thr, throughput)
        gi_depth = jnp.where(is_diff & go, gi_depth + 1, gi_depth)
        alive = go

        # ---- compact the surviving front for the next bounce -----------
        if bounce + 1 < config.max_depth:
            from fovtrace.kernels import sampling as sampling_mod

            width = origin.shape[0]
            budget = max(1024, width // 2)
            if budget < width:
                idx, active = sampling_mod.compact_mask(alive, budget)
                gather = lambda a: a[idx]
                origin = gather(origin)
                direction = gather(direction)
                throughput = gather(throughput)
                seeds = gather(seeds)
                gi_depth = gather(gi_depth)
                pix = jnp.where(active, gather(pix), n)  # n = OOB drop
                alive = active & gather(alive)

    aux = {
        "point": first_point,
        "normal": first_normal,
        "t": first_t,
        "rays_traced": rays_traced,
    }
    return result, aux
