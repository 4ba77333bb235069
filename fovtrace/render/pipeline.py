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
  shading_launch   (entry 3)  -> shade.shade_v on the compacted ray list
                                 + temporal accumulate
  JFA/Sibson/PullPush/ATrous  -> kernels.{jfa,sibson,pullpush,atrous}
  gaze_target/ray_count readback -> returned as device arrays (no sync)

Frame-to-frame state (history/depth caches, prev camera) is an explicit
`FrameState` pytree instead of double-buffered GL textures
(PathTracer::swapBuffer, PathTracer.cpp:226-238).

Round-3 layout: every image buffer inside the frame is PLANAR ([H,W]
channel planes / SoA Vec3; history is [4,H,W]) and the wavefront is SoA
— see fovtrace.core.vec. Row-layout [H,W,C] buffers are materialized
only for the `config.full_outputs` switchboard dict (display/debug).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fovtrace.config import RenderConfig
from fovtrace.core import color as colorx
from fovtrace.core import mathx
from fovtrace.core import reproject, rng, vec
from fovtrace.core.camera import Camera
from fovtrace.core.vec import Vec3
from fovtrace.kernels import atrous, jfa, pullpush, saliency, sampling, sibson
from fovtrace.render import gbuffer as gbuffer_mod
from fovtrace.render import shade as shade_mod


@struct.dataclass
class FrameState:
    history: jnp.ndarray      # [4,H,W] accumulated radiance planes
    #                           (plane 3 = #samples); channel-major so
    #                           the minor axes are dense on TPU
    depth_cache: jnp.ndarray  # [H,W] view depth of the previous frame
    prev_camera: Camera
    frame: jnp.ndarray        # scalar int32

    @classmethod
    def initial(cls, camera: Camera, config: RenderConfig) -> "FrameState":
        h, w = config.height, config.width
        return cls(
            history=jnp.zeros((4, h, w), jnp.float32),
            depth_cache=jnp.zeros((h, w), jnp.float32),
            prev_camera=camera,
            frame=jnp.asarray(0, jnp.int32),
        )


def stage_gbuffer(scene, camera, prev_camera, config: RenderConfig):
    """Stage 1 (reference entry 0 / 'GB'). Planar G-buffers."""
    return gbuffer_mod.trace_gbuffer(
        scene, camera, prev_camera, config.width, config.height, config)


def stage_sampling(scene, gbuf, gaze_px, state, config: RenderConfig):
    """Stage 2 (reference entry 1 / 'Sampling'): cache validation +
    saliency + the binary sample mask. Returns
    (mask, sal, is_valid, qy, qx, gaze_target, ray_count)."""
    h, w = config.height, config.width
    n_pix = h * w
    is_valid, qy, qx, fetched = reproject.validate_cache(
        gbuf["reproject_u"], gbuf["reproject_v"], gbuf["position"],
        state.depth_cache, state.prev_camera.eye, w, h,
        config.cache_epsilon, history=state.history,
    )
    if not config.temporal:
        is_valid = jnp.zeros_like(is_valid)

    bbox_diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)
    sal = saliency.compute_saliency(gbuf, gaze_px, bbox_diag,
                                    config.saliency_block)
    gdist = sampling.gaze_distance(h, w, gaze_px)

    if config.sampling_mode == "full":
        mask = jnp.ones((h, w), bool)
    elif config.sampling_mode in ("weier", "author"):
        # two stochastic falloff models (samplingStep.cu:145-156): the
        # Weier et al. linear ramp and the author's rational falloff
        if config.sampling_mode == "weier":
            rate = sampling.weier_sample_rate(gdist, config.aperture,
                                              config.p_min)
        else:
            rate = sampling.author_sample_rate(gdist, config.aperture)
        u01 = rng.rnd(rng.pixel_seed(jnp.arange(n_pix).reshape(h, w),
                                     state.frame))[0]
        mask = u01 < rate
    elif config.sampling_mode == "logpolar":
        mask = sampling.logpolar_sampling(h, w, gaze_px)
    else:  # "masked" — the reference's active strategy
        mask = sampling.masked_sampling(
            h, w, gdist, sal, config.aperture, config.extra_sample_rate
        )

    p = gbuf["position"]
    gaze_target = jnp.stack([p.x[gaze_px[0], gaze_px[1]],
                             p.y[gaze_px[0], gaze_px[1]],
                             p.z[gaze_px[0], gaze_px[1]]])
    ray_count = jnp.sum(mask.astype(jnp.int32))
    return mask, sal, is_valid, fetched, gaze_target, ray_count


def stage_compact(mask, config: RenderConfig):
    """Stage 3 (reference entry 2 / warpSort / 'Optimize').

    Compacts in 16x16 TILE order, not scanline order: each 256-ray
    window of the compacted list then covers a compact screen region, so
    the intersection kernel's bundle frustums stay tight through the
    shade bounces (the warpSort coherence goal, warpSort.cu:67 — ours is
    spatial instead of intra-warp). Measured 8x on the shade-stage
    intersects vs scanline-ordered compaction.

    Returns (idx [budget] scanline pixel ids, active [budget], rank
    [H*W] i32 compacted slot per pixel, gate [H*W] bool landed-in-
    budget) — rank/gate are the inverse map that lets the accumulate
    run as a row gather instead of a scatter (see compact_mask_rank)."""
    h, w = config.height, config.width
    if h % 16 == 0 and w % 16 == 0:
        from fovtrace.render.gbuffer import (swizzle_to_tiles,
                                             unswizzle_from_tiles)

        mask_sw = swizzle_to_tiles(mask.reshape(-1), h, w)
        idx_sw, active, rank_sw, gate_sw = sampling.compact_mask_rank(
            mask_sw, config.ray_budget)
        # tile-major -> scanline pixel id ARITHMETICALLY (10 int ops on
        # the compacted [budget] array) instead of gathering through a
        # [H*W] permutation table (~10 ms at 627k indices)
        tw = w // 16
        ty = idx_sw // (tw * 256)
        r1 = idx_sw % (tw * 256)
        tx = r1 // 256
        r2 = r1 % 256
        iy = r2 // 16
        ix = r2 % 16
        idx = (ty * 16 + iy) * w + tx * 16 + ix
        # the per-pixel inverse map back to scanline order (regular
        # reshape/transpose permutation — cheap)
        rank = unswizzle_from_tiles(rank_sw, h, w)
        gate = unswizzle_from_tiles(gate_sw, h, w)
        return idx, active, rank, gate
    idx, active, rank, gate = sampling.compact_mask_rank(
        mask.reshape(-1), config.ray_budget)
    return idx, active, rank, gate


def stage_shade(scene, camera, idx, active, fetched, is_valid, state,
                config: RenderConfig, gaze_target=None, rank=None,
                gate=None):
    """Stage 4 (reference entry 3 / 'Shading'): foveated path trace of
    the compacted wavefront + temporal accumulate. Returns
    (shading (Vec3 rgb, alpha) planar, history [4,H,W], traced_mask,
    rays_traced).

    With config.dof, `gaze_target` (the G-buffer hit under the gaze)
    autofocuses a thin-lens camera: focus distance = |gaze_target - eye|
    — the reference's per-frame gaze->camera-focus readback
    (REF/main.cpp:278-287) without the GPU->CPU sync."""
    h, w = config.height, config.width
    n_pix = h * w
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)

    # reuse the sampling stage's single cache row-gather: full-image
    # planes for the accumulate (elementwise), one [budget,5] row gather
    # for the per-ray history
    c_history = reproject.history_from_fetch(fetched, is_valid)
    hrows = fetched[idx].T                    # [5, budget]: one transpose
    #                                           so per-channel reads slice
    #                                           dense rows, not padded cols
    vray = is_valid.reshape(-1)[idx] > 0.0
    hist = [jnp.where(vray, hrows[c], 0.0) for c in range(4)]

    # seed depends on frame only once history exists
    # (fov_path_trace_camera.cu:123: frame-independent until cache valid)
    seed_frame = jnp.where(hist[3] > 0.0, state.frame, 0)
    seeds = rng.pixel_seed(idx, seed_frame)

    j1, seeds = rng.rnd(seeds)
    j2, seeds = rng.rnd(seeds)
    ndc_x = (px + j1 - 0.5) / w * 2.0 - 1.0
    ndc_y = (py + j2 - 0.5) / h * 2.0 - 1.0
    _, dirs = camera.unproject_v(ndc_x, ndc_y, float(w) / float(h))
    origins = vec.splat(camera.eye, dirs.shape)

    if config.dof and gaze_target is not None:
        u1, seeds = rng.rnd(seeds)
        u2, seeds = rng.rnd(seeds)
        focus = jnp.linalg.norm(gaze_target - camera.eye)
        origins, dirs = camera.thin_lens_perturb_v(
            dirs, focus, config.lens_radius, u1, u2)

    radiance, shade_aux = shade_mod.shade_v(scene, origins, dirs, seeds,
                                            config)
    tm = radiance.map(
        lambda c: colorx.uncharted2_tonemap(c, config.exposure_bias))

    # temporal accumulate: final = tonemapped + history
    # (fov_path_trace_camera.cu:167-175). With the inverse rank map
    # from stage_compact this is ONE [n_pix]-index row GATHER from the
    # [B,5] ray rows (delta[p] = rows5[rank[p]] * gate[p]) — the
    # round-4 [B,5] row scatter serialized per index in the scatter
    # engine (measured 27 ms vs 8.6 ms for the gather at bench config).
    act = active.astype(jnp.float32)
    rows5 = jnp.stack([tm.x * act, tm.y * act, tm.z * act, act, act],
                      axis=-1)                              # [B, 5]
    if rank is not None:
        # custom_vjp: the backward is the inverse gather at idx, not a
        # 2.1M-index scatter-add (saved ~90 ms of the backward pass)
        acc = sampling.expand_by_rank(
            rows5, rank.reshape(-1).astype(jnp.float32),
            gate.reshape(-1).astype(jnp.float32),
            idx.astype(jnp.float32), active.astype(jnp.float32)).T
    else:
        # callers without the inverse map (compat): row scatter
        safe_idx = jnp.where(active, idx, n_pix)  # OOB drops
        acc = (jnp.zeros((n_pix, 5), jnp.float32)
               .at[safe_idx].add(rows5, mode="drop").T)     # [5, n_pix]
    delta_planes = acc[:4].reshape(4, h, w)
    history = c_history + delta_planes

    traced_mask = acc[4].reshape(h, w)

    cnt = history[3]
    inv = mathx.safe_inv_pos(cnt)  # NaN-free backward at cnt == 0
    # holes: pixels with neither a traced ray nor reusable history stay 0
    shading_rgb = Vec3(history[0] * inv, history[1] * inv, history[2] * inv)
    shading_alpha = (cnt > 0.0).astype(jnp.float32)
    return (shading_rgb, shading_alpha), history, traced_mask, \
        shade_aux["rays_traced"]


def stage_reconstruct(shading_rgb: Vec3, shading_alpha, gbuf,
                      config: RenderConfig):
    """Stage 5 (the reference's GL post chain: JFA -> Sibson; PullPush ->
    ATrous; selectable alternatives, main.cpp:336-358). Returns
    (image_rgb Vec3, image_alpha, row_extras dict for full outputs)."""
    recon = config.reconstruction
    extras: Dict[str, jnp.ndarray] = {}
    if recon == "none":
        return shading_rgb, shading_alpha, extras

    out_rgb, out_a = shading_rgb, shading_alpha
    if recon in ("jfa", "sibson", "all"):
        # JFA/Sibson operate on the packed [H,W,4] layout (log2 gather
        # passes dominate them; planarization is a follow-up)
        sh_rows = jnp.concatenate(
            [vec.to_rows(shading_rgb), shading_alpha[..., None]], axis=-1)
        coord, jfa_color = jfa.jump_flood(sh_rows)
        extras["jfa"] = jfa_color
        if recon in ("sibson", "all"):
            extras["sibson"] = sibson.sibson_interpolate(
                coord, jfa_color, config.sibson_max_radius)
        if recon == "jfa":
            out_rgb, out_a = vec.from_rows(jfa_color[..., :3]), \
                jfa_color[..., 3]
        elif recon == "sibson":
            out_rgb, out_a = vec.from_rows(extras["sibson"][..., :3]), \
                extras["sibson"][..., 3]
    if recon in ("pullpush", "atrous", "all"):
        pp_rgb, pp_a = pullpush.pull_push_v(shading_rgb, shading_alpha)
        extras["pullpush"] = jnp.concatenate(
            [vec.to_rows(pp_rgb), pp_a[..., None]], axis=-1) \
            if config.full_outputs else None
        out_rgb, out_a = pp_rgb, pp_a
        if recon in ("atrous", "all"):
            at = atrous.atrous_denoise_v(
                pp_rgb, gbuf["position"], gbuf["normal"],
                config.atrous_iterations, config.atrous_c_phi,
                config.atrous_n_phi, config.atrous_p_phi,
            )
            if config.full_outputs:
                extras["atrous"] = jnp.concatenate(
                    [vec.to_rows(at), pp_a[..., None]], axis=-1)
            out_rgb, out_a = at, pp_a
    extras = {k: v for k, v in extras.items() if v is not None}
    return out_rgb, out_a, extras


def render_frame(
    scene,
    camera: Camera,
    gaze_px,
    state: FrameState,
    config: RenderConfig,
) -> Tuple[Dict[str, jnp.ndarray], FrameState]:
    """Render one frame. gaze_px: (gy, gx) int32 pixel coords.

    Returns (outputs, new_state). With config.full_outputs, `outputs`
    mirrors the reference's keys-1..9 texture switchboard
    (main.cpp:396-409) in the row layout; otherwise only the selected
    image (as planar `image_rgb`/`image_alpha` + stacked `image`) and
    the counters are returned — the training/bench fast path.
    """
    h, w = config.height, config.width

    # ---- 1. G-buffer (entry 0) ----------------------------------------
    gbuf = stage_gbuffer(scene, camera, state.prev_camera, config)

    # ---- 2. sampling step (entry 1) -----------------------------------
    mask, sal, is_valid, fetched, gaze_target, ray_count = stage_sampling(
        scene, gbuf, gaze_px, state, config)

    # ---- 3. compaction (entry 2 / warpSort) ---------------------------
    idx, active, rank, gate = stage_compact(mask, config)

    # ---- 4. foveated shading (entry 3) --------------------------------
    (shading_rgb, shading_alpha), history, traced_mask, shade_rays = \
        stage_shade(scene, camera, idx, active, fetched, is_valid, state,
                    config, gaze_target=gaze_target, rank=rank, gate=gate)

    # ---- 5. reconstruction (GL post chain) ----------------------------
    image_rgb, image_alpha, extras = stage_reconstruct(
        shading_rgb, shading_alpha, gbuf, config)

    outputs: Dict[str, jnp.ndarray] = {
        "image_rgb": image_rgb,
        "image_alpha": image_alpha,
        "gaze_target": gaze_target,
        "ray_count": ray_count,
        # mask pixels that did NOT get a compaction slot (budget
        # truncation) — mirrors the sharded path's counter; bench.py
        # asserts this is 0 so a dense mask can't silently under-trace
        "rays_dropped": ray_count - jnp.sum(gate.astype(jnp.int32)),
        # honest device ray work this frame: G-buffer primary + issued
        # shadow rays, plus every closest-hit/shadow ray of the compacted
        # wavefront bounces (bench.py's Mrays/s numerator)
        "rays_traced": gbuf["rays_traced"] + shade_rays,
    }

    if config.full_outputs:
        grows = gbuffer_mod.gbuffer_rows(gbuf)
        outputs.update({
            "image": vec.to_rows(image_rgb),
            "position": grows["position"],
            "normal": grows["normal"],
            "depth": grows["depth"],
            "albedo": grows["albedo"],
            "weight": jnp.concatenate(
                [grows["reproject_uv"], is_valid[..., None],
                 jnp.zeros((h, w, 1))], axis=-1),
            "shading": jnp.concatenate(
                [vec.to_rows(shading_rgb), shading_alpha[..., None]],
                axis=-1),
            "saliency": sal,
            "saliency_view": colorx.heatmap(sal),
            "mask": mask,
            "traced": traced_mask,
        })
        outputs.update(extras)

    new_state = FrameState(
        history=history,
        depth_cache=gbuf["depth"],
        prev_camera=camera,
        frame=state.frame + 1,
    )
    return outputs, new_state


def _unproject(camera: Camera, ndc_x, ndc_y, w, h):
    """NDC -> world ray direction rows (compat helper; the pipeline uses
    camera.unproject_v directly)."""
    _, dirs = camera.unproject_v(ndc_x, ndc_y, float(w) / float(h))
    return vec.to_rows(dirs)


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
        frames.append(out["image"] if "image" in out
                      else vec.to_rows(out["image_rgb"]))
    return frames, state
