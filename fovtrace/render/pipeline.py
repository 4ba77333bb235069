"""Per-frame render pipeline: the TPU-native frame orchestrator.

Re-designs the reference's frame loop (`main.cpp:227-443`: 4 OptiX
launches + 4-5 GL passes + 2 synchronous GPU->CPU readbacks) as ONE pure
function `render_frame(scene, camera, gaze, state, config)` that XLA
compiles end-to-end — no host round-trips inside a frame.

Stage map (reference -> here):
  geometry_launch  (entry 0)  -> gbuffer.trace_gbuffer
  sampling_launch  (entry 1)  -> saliency + sampling mask + cache check
  optimize_launch  (entry 2)  -> sampling.compact_rays (argsort compaction
                                 replaces warpSort's serial row loops)
  shading_launch   (entry 3)  -> shade.shade on the compacted ray list
                                 + temporal accumulate
  JFA/Sibson/PullPush/ATrous  -> kernels.{jfa,sibson,pullpush,atrous}
  gaze_target/ray_count readback -> returned as device arrays (no sync)

Frame-to-frame state (history/depth caches, prev camera) is an explicit
`FrameState` pytree instead of double-buffered GL textures
(PathTracer::swapBuffer, PathTracer.cpp:226-238).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fovtrace.config import RenderConfig
from fovtrace.core import color as colorx
from fovtrace.core import reproject, rng
from fovtrace.core.camera import Camera
from fovtrace.kernels import atrous, jfa, pullpush, saliency, sampling, sibson
from fovtrace.render import gbuffer as gbuffer_mod
from fovtrace.render import shade as shade_mod


@struct.dataclass
class FrameState:
    history: jnp.ndarray      # [H,W,4] accumulated radiance (w = #samples)
    depth_cache: jnp.ndarray  # [H,W] view depth of the previous frame
    prev_camera: Camera
    frame: jnp.ndarray        # scalar int32

    @classmethod
    def initial(cls, camera: Camera, config: RenderConfig) -> "FrameState":
        h, w = config.height, config.width
        return cls(
            history=jnp.zeros((h, w, 4), jnp.float32),
            depth_cache=jnp.zeros((h, w), jnp.float32),
            prev_camera=camera,
            frame=jnp.asarray(0, jnp.int32),
        )


def stage_gbuffer(scene, camera, prev_camera, config: RenderConfig):
    """Stage 1 (reference entry 0 / 'GB')."""
    return gbuffer_mod.trace_gbuffer(
        scene, camera, prev_camera, config.width, config.height, config)


def stage_sampling(scene, gbuf, gaze_px, state, config: RenderConfig):
    """Stage 2 (reference entry 1 / 'Sampling'): cache validation +
    saliency + the binary sample mask. Returns
    (mask, sal, is_valid, q_uv, gaze_target, ray_count)."""
    h, w = config.height, config.width
    n_pix = h * w
    is_valid, q_uv = reproject.validate_cache(
        gbuf["reproject_uv"], gbuf["position"], state.depth_cache,
        state.prev_camera.eye, w, h, config.cache_epsilon,
    )
    if not config.temporal:
        is_valid = jnp.zeros_like(is_valid)

    bbox_diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)
    sal = saliency.compute_saliency(gbuf, gaze_px, bbox_diag,
                                    config.saliency_block)
    gdist = sampling.gaze_distance(h, w, gaze_px)

    if config.sampling_mode == "full":
        mask = jnp.ones((h, w), bool)
    elif config.sampling_mode == "weier":
        rate = sampling.weier_sample_rate(gdist, config.aperture, config.p_min)
        u01 = rng.rnd(rng.pixel_seed(jnp.arange(n_pix).reshape(h, w),
                                     state.frame))[0]
        mask = u01 < rate
    elif config.sampling_mode == "logpolar":
        mask = sampling.logpolar_sampling(h, w, gaze_px)
    else:  # "masked" — the reference's active strategy
        mask = sampling.masked_sampling(
            h, w, gdist, sal, config.aperture, config.extra_sample_rate
        )

    gaze_target = gbuf["position"][gaze_px[0], gaze_px[1]]
    ray_count = jnp.sum(mask.astype(jnp.int32))
    return mask, sal, is_valid, q_uv, gaze_target, ray_count


def stage_compact(mask, config: RenderConfig):
    """Stage 3 (reference entry 2 / warpSort / 'Optimize')."""
    return sampling.compact_rays(mask, config.ray_budget)


def stage_shade(scene, camera, idx, active, q_uv, is_valid, state,
                config: RenderConfig, gaze_target=None):
    """Stage 4 (reference entry 3 / 'Shading'): foveated path trace of
    the compacted wavefront + temporal accumulate. Returns
    (shading [H,W,4] normalized color, history [H,W,4], traced_mask,
    rays_traced).

    With config.dof, `gaze_target` (the G-buffer hit under the gaze)
    autofocuses a thin-lens camera: focus distance = |gaze_target - eye|
    — the reference's per-frame gaze->camera-focus readback
    (REF/main.cpp:278-287) without the GPU->CPU sync."""
    h, w = config.height, config.width
    n_pix = h * w
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)

    c_history = reproject.fetch_history(state.history, q_uv, is_valid)
    hist_flat = c_history.reshape(-1, 4)
    hist_rays = hist_flat[idx]

    # seed depends on frame only once history exists
    # (fov_path_trace_camera.cu:123: frame-independent until cache valid)
    seed_frame = jnp.where(hist_rays[:, 3] > 0.0, state.frame, 0)
    seeds = rng.pixel_seed(idx, seed_frame)

    j1, seeds = rng.rnd(seeds)
    j2, seeds = rng.rnd(seeds)
    ndc_x = (px + j1 - 0.5) / w * 2.0 - 1.0
    ndc_y = (py + j2 - 0.5) / h * 2.0 - 1.0
    dirs = _unproject(camera, ndc_x, ndc_y, w, h)
    origins = jnp.broadcast_to(camera.eye, dirs.shape)

    if config.dof and gaze_target is not None:
        u1, seeds = rng.rnd(seeds)
        u2, seeds = rng.rnd(seeds)
        focus = jnp.linalg.norm(gaze_target - camera.eye)
        origins, dirs = camera.thin_lens_perturb(
            dirs, focus, config.lens_radius, u1, u2)

    radiance, shade_aux = shade_mod.shade(scene, origins, dirs, seeds, config)
    tonemapped = colorx.uncharted2_tonemap(radiance, config.exposure_bias)

    # temporal accumulate: final = tonemapped + history
    # (fov_path_trace_camera.cu:167-175)
    sample = jnp.concatenate(
        [tonemapped, jnp.ones((tonemapped.shape[0], 1))], axis=-1
    )
    new_hist_rays = jnp.where(active[:, None], sample + hist_rays, hist_rays)

    traced_mask = sampling.scatter_rays(
        jnp.ones((config.ray_budget,), jnp.float32), idx, active, n_pix
    ).reshape(h, w)
    delta = sampling.scatter_rays(
        new_hist_rays - hist_rays, idx, active, n_pix
    ).reshape(h, w, 4)
    history = c_history + delta

    shading = colorx.accumulate_to_color(history)
    # holes: pixels with neither a traced ray nor reusable history
    shading = shading * (history[..., 3:4] > 0.0)
    return shading, history, traced_mask, shade_aux["rays_traced"]


def stage_reconstruct(shading, gbuf, config: RenderConfig
                      ) -> Dict[str, jnp.ndarray]:
    """Stage 5 (the reference's GL post chain: JFA -> Sibson; PullPush ->
    ATrous; selectable alternatives, main.cpp:336-358). Returns the recon
    buffers plus the selected 'image'."""
    outputs: Dict[str, jnp.ndarray] = {}
    recon = config.reconstruction
    if recon != "none":
        # lazy: JFA feeds only the jfa/sibson reconstructors — don't pay
        # its ~40ms when the selected output is pullpush/atrous
        if recon in ("jfa", "sibson", "all"):
            coord, jfa_color = jfa.jump_flood(shading)
            outputs["jfa"] = jfa_color
        if recon in ("sibson", "all"):
            outputs["sibson"] = sibson.sibson_interpolate(
                coord, jfa_color, config.sibson_max_radius
            )
        if recon in ("pullpush", "atrous", "all"):
            pp = pullpush.pull_push(shading)
            outputs["pullpush"] = pp
            if recon in ("atrous", "all"):
                outputs["atrous"] = jnp.concatenate(
                    [
                        atrous.atrous_denoise(
                            pp[..., :3], gbuf["position"], gbuf["normal"],
                            config.atrous_iterations, config.atrous_c_phi,
                            config.atrous_n_phi, config.atrous_p_phi,
                        ),
                        pp[..., 3:4],
                    ],
                    axis=-1,
                )
        final_key = {"jfa": "jfa", "sibson": "sibson",
                     "pullpush": "pullpush", "atrous": "atrous",
                     "all": "atrous"}[recon]
        outputs["image"] = outputs[final_key][..., :3]
    else:
        outputs["image"] = shading[..., :3]
    return outputs


def render_frame(
    scene,
    camera: Camera,
    gaze_px,
    state: FrameState,
    config: RenderConfig,
) -> Tuple[Dict[str, jnp.ndarray], FrameState]:
    """Render one frame. gaze_px: (gy, gx) int32 pixel coords.

    Returns (outputs, new_state). `outputs` mirrors the reference's
    keys-1..9 texture switchboard (main.cpp:396-409).
    """
    h, w = config.height, config.width

    # ---- 1. G-buffer (entry 0) ----------------------------------------
    gbuf = stage_gbuffer(scene, camera, state.prev_camera, config)

    # ---- 2. sampling step (entry 1) -----------------------------------
    mask, sal, is_valid, q_uv, gaze_target, ray_count = stage_sampling(
        scene, gbuf, gaze_px, state, config)

    # ---- 3. compaction (entry 2 / warpSort) ---------------------------
    idx, active = stage_compact(mask, config)

    # ---- 4. foveated shading (entry 3) --------------------------------
    shading, history, traced_mask, shade_rays = stage_shade(
        scene, camera, idx, active, q_uv, is_valid, state, config,
        gaze_target=gaze_target)

    # ---- 5. reconstruction (GL post chain) ----------------------------
    outputs: Dict[str, jnp.ndarray] = {
        "position": gbuf["position"],
        "normal": gbuf["normal"],
        "depth": gbuf["depth"],
        "albedo": gbuf["albedo"],
        "weight": jnp.concatenate(
            [gbuf["reproject_uv"], is_valid[..., None],
             jnp.zeros((h, w, 1))], axis=-1),
        "shading": shading,
        "saliency": sal,
        "saliency_view": colorx.heatmap(sal),
        "mask": mask,
        "traced": traced_mask,
        "gaze_target": gaze_target,
        "ray_count": ray_count,
        # honest device ray work this frame: G-buffer primary + issued
        # shadow rays, plus every closest-hit/shadow ray of the compacted
        # wavefront bounces (bench.py's Mrays/s numerator)
        "rays_traced": gbuf["rays_traced"] + shade_rays,
    }

    outputs.update(stage_reconstruct(shading, gbuf, config))

    new_state = FrameState(
        history=history,
        depth_cache=gbuf["depth"],
        prev_camera=camera,
        frame=state.frame + 1,
    )
    return outputs, new_state


def _unproject(camera: Camera, ndc_x, ndc_y, w, h):
    """NDC -> world ray direction through the inverse MVP (matches
    Camera.primary_rays but for flat compacted pixel lists)."""
    from fovtrace.core import mathx

    d = jnp.stack(
        [ndc_x, ndc_y, jnp.full_like(ndc_x, -1.0), jnp.ones_like(ndc_x)],
        axis=-1,
    )
    inv = camera.inv_mvp(float(w) / float(h))
    world = jnp.einsum("ij,nj->ni", inv, d)
    near = world[:, :3] / world[:, 3:4]
    return mathx.normalize(near - camera.eye)


@functools.partial(jax.jit, static_argnames=("config",))
def render_frame_jit(scene, camera, gaze_px, state, config: RenderConfig):
    return render_frame(scene, camera, gaze_px, state, config)


def render_sequence(scene, cameras, gazes, config: RenderConfig,
                    state: FrameState | None = None):
    """Render a gaze/camera trajectory (replaces the interactive loop;
    gaze comes from data instead of the mouse, README.md:13)."""
    if state is None:
        state = FrameState.initial(jax.tree.map(lambda x: x, cameras[0]), config)
    frames = []
    for cam, gaze in zip(cameras, gazes):
        out, state = render_frame_jit(scene, cam, gaze, state, config)
        frames.append(out["image"])
    return frames, state
