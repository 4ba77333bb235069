"""Per-stage timed frame execution (`--profile-stages`).

TPU counterpart of the reference's per-stage measurement harness: GL
GL_TIME_ELAPSED query objects around every GL pass + clock() around each
OptiX launch, formatted into per-frame CSV columns "GB, Sampling,
Optimize, Shading, JPA, SI, PPI, AT, Total, FPS, aperture, ray count"
(`REF/main.cpp:16-24,260-374`, `PrintMSTimes` `main.cpp:21-24`).

Each stage is the SAME code as the fused pipeline (pipeline.stage_*),
jitted separately and synchronized with block_until_ready — diagnostic
numbers; the fused `render_frame_jit` stays the production path (XLA
fuses across stage boundaries, so the staged sum slightly exceeds the
fused total).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fovtrace.config import RenderConfig
from fovtrace.core import color as colorx
from fovtrace.core import vec
from fovtrace.kernels import atrous, jfa, pullpush, sibson
from fovtrace.render import gbuffer as gbuffer_mod
from fovtrace.render import pipeline


@functools.lru_cache(maxsize=8)
def _jitted_stages(config: RenderConfig):
    """Separately-jitted stage functions for one config (cached)."""
    s_gb = jax.jit(lambda sc, cam, pc: pipeline.stage_gbuffer(
        sc, cam, pc, config))
    s_samp = jax.jit(lambda sc, gbuf, gaze, st: pipeline.stage_sampling(
        sc, gbuf, gaze, st, config))
    s_opt = jax.jit(lambda m: pipeline.stage_compact(m, config))
    s_shade = jax.jit(
        lambda sc, cam, idx, act, fet, val, st, gt, rk, gt2:
        pipeline.stage_shade(
            sc, cam, idx, act, fet, val, st, config, gaze_target=gt,
            rank=rk, gate=gt2))

    s_jfa = jax.jit(lambda sh: jfa.jump_flood(sh))
    s_si = jax.jit(lambda co, col: sibson.sibson_interpolate(
        co, col, config.sibson_max_radius))
    s_ppi = jax.jit(pullpush.pull_push_v)
    s_at = jax.jit(lambda pp_rgb, p, n: atrous.atrous_denoise_v(
        pp_rgb, p, n, config.atrous_iterations, config.atrous_c_phi,
        config.atrous_n_phi, config.atrous_p_phi))
    return s_gb, s_samp, s_opt, s_shade, s_jfa, s_si, s_ppi, s_at


def render_frame_staged(scene, camera, gaze_px, state,
                        config: RenderConfig, timer
                        ) -> Tuple[Dict[str, jnp.ndarray], object]:
    """One frame with each stage timed into `timer` (app.profiler
    StageTimer). Column names match the reference report: GB, Sampling,
    Optimize, Shading, JFA, SI, PPI, AT. Runs whatever reconstruction
    set `config.reconstruction` selects ('all' runs all four)."""
    s_gb, s_samp, s_opt, s_shade, s_jfa, s_si, s_ppi, s_at = _jitted_stages(
        config)
    recon = config.reconstruction

    with timer.stage("GB") as box:
        gbuf = s_gb(scene, camera, state.prev_camera)
        box["result"] = gbuf

    with timer.stage("Sampling") as box:
        mask, sal, is_valid, fetched, gaze_target, ray_count = s_samp(
            scene, gbuf, gaze_px, state)
        box["result"] = (mask, sal)

    with timer.stage("Optimize") as box:
        idx, active, rank, gate = s_opt(mask)
        box["result"] = idx

    with timer.stage("Shading") as box:
        (shading_rgb, shading_alpha), history, traced_mask, shade_rays = \
            s_shade(scene, camera, idx, active, fetched, is_valid, state,
                    gaze_target, rank, gate)
        box["result"] = shading_rgb

    shading_rows = jnp.concatenate(
        [vec.to_rows(shading_rgb), shading_alpha[..., None]], axis=-1)
    grows = gbuffer_mod.gbuffer_rows(gbuf)
    outputs: Dict[str, jnp.ndarray] = {
        "position": grows["position"],
        "normal": grows["normal"],
        "depth": grows["depth"],
        "albedo": grows["albedo"],
        "shading": shading_rows,
        "saliency": sal,
        "saliency_view": colorx.heatmap(sal),
        "mask": mask,
        "traced": traced_mask,
        "gaze_target": gaze_target,
        "ray_count": ray_count,
        "rays_traced": gbuf["rays_traced"] + shade_rays,
    }

    if recon in ("jfa", "sibson", "all"):
        with timer.stage("JFA") as box:
            coord, jfa_color = s_jfa(shading_rows)
            box["result"] = jfa_color
        outputs["jfa"] = jfa_color
    if recon in ("sibson", "all"):
        with timer.stage("SI") as box:
            outputs["sibson"] = s_si(coord, jfa_color)
            box["result"] = outputs["sibson"]
    if recon in ("pullpush", "atrous", "all"):
        with timer.stage("PPI") as box:
            pp_rgb, pp_a = s_ppi(shading_rgb, shading_alpha)
            box["result"] = pp_a
        outputs["pullpush"] = jnp.concatenate(
            [vec.to_rows(pp_rgb), pp_a[..., None]], axis=-1)
        if recon in ("atrous", "all"):
            with timer.stage("AT") as box:
                at = s_at(pp_rgb, gbuf["position"], gbuf["normal"])
                box["result"] = at
            outputs["atrous"] = jnp.concatenate(
                [vec.to_rows(at), pp_a[..., None]], axis=-1)
    if recon != "none":
        final_key = {"jfa": "jfa", "sibson": "sibson",
                     "pullpush": "pullpush", "atrous": "atrous",
                     "all": "atrous"}[recon]
        outputs["image"] = outputs[final_key][..., :3]
    else:
        outputs["image"] = shading_rows[..., :3]

    new_state = pipeline.FrameState(
        history=history,
        depth_cache=gbuf["depth"],
        prev_camera=camera,
        frame=state.frame + 1,
    )
    return outputs, new_state
