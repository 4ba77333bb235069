"""Render configuration.

Replaces the reference's mutable-global config surface (`REF/gui.cpp:7-26`:
`g_apertureSize`, `g_light_Power`, `g_diffuse_max_depth`, `g_isOptimize`,
resolution argv, keyboard-driven view switching) with a single frozen
dataclass that is hashable, so it can be a static argument under `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render parameters.

    Defaults mirror the reference's operating point:
      - aperture (normalized foveal radius) 0.07    (REF/gui.cpp:13)
      - Weier falloff p_min = 0.05                  (REF/cuda/samplingStep.cu:150)
      - diffuse GI depth 1                          (REF/gui.cpp:21)
      - reflect/refract max depth, phong_exp 88, IOR 1.4
                                                    (REF/PathTracer.cpp:724-757)
    """

    width: int = 1024
    height: int = 1024

    # --- foveation ---
    aperture: float = 0.07          # normalized foveal radius r0
    p_min: float = 0.05             # peripheral floor of the Weier falloff
    sampling_mode: str = "masked"   # "masked" | "weier" | "author" | "logpolar" | "full"
    saliency_block: int = 4         # 4x4 block granularity (samplingStep.cu:186)
    extra_sample_rate: int = 8      # sparse periphery floor 1/8^2 (shared_helper_funcs.h:282)

    # --- path tracing ---
    diffuse_max_depth: int = 1      # GI bounces
    max_depth: int = 4              # reflect/refract bounce cap (wavefront iterations)
    importance_cutoff: float = 0.01
    scene_epsilon: float = 1e-3
    samples_per_pixel: int = 1
    envmap_scale: float = 2.0       # envmap_miss multiplies by 2.0 (gradientbg.cu:66)

    # --- ray budget (static compaction size as a fraction of W*H) ---
    ray_budget_frac: float = 0.35
    # Per-bounce wavefront budgets as fractions of the INITIAL wavefront
    # width (bounce k+1's compacted size; the last entry repeats). The
    # measured survivor fractions at bench config are ~10% after bounce
    # 0 (specular pixels only once diffuse_max_depth=1 ends GI) and
    # ~0.5% after bounce 1, so the old width-halving schedule ran
    # 79-99.8% dead lanes. Defaults keep >=2x headroom on every shipped
    # scene; overflow drops the lowest-priority tail (same truncation
    # class as importance_cutoff). Floor 1024 slots.
    bounce_budget_fracs: tuple = (0.25, 0.06, 0.02)
    # per-tile budget multiplier for the sharded path: each tile gets
    # sharded_budget_factor x (ray_budget / n_tiles) compaction slots,
    # because the tile containing the fovea needs more than 1/N
    sharded_budget_factor: float = 2.0

    # --- thin-lens depth of field (createPinHoleCam,
    #     shared_helper_funcs.h:302-338; gaze autofocus main.cpp:278-287) ---
    dof: bool = False
    lens_radius: float = 0.05       # lens disc radius, world units

    # --- temporal ---
    temporal: bool = True
    cache_epsilon: float = 1e-3     # depth-cache validation epsilon

    # --- reconstruction ---
    reconstruction: str = "pullpush"  # "jfa" | "sibson" | "pullpush" | "atrous" | "none"
    atrous_iterations: int = 1
    atrous_c_phi: float = 1.0
    atrous_n_phi: float = 0.5
    atrous_p_phi: float = 0.5
    sibson_max_radius: int = 16     # static bound on the Sibson disc gather

    # --- backend selection ---
    use_pallas: bool = True         # Pallas kernels on TPU; pure-XLA fallback otherwise
    intersect_backend: str = "auto" # "auto" | "brute" | "bvh"

    # rematerialize each shade bounce in the backward pass (trades a 2nd
    # forward evaluation for not materializing per-bounce residuals —
    # with the SoA wavefront residuals are ~40x smaller than round 2's
    # padded [N,3] layout, so this is OFF by default)
    remat_shade: bool = False

    # build the full view-switchboard output dict (position/normal/...,
    # the reference's keys 1-9 main.cpp:396-409). False = only the
    # selected image + counters — the bench/training path, where dead
    # outputs would otherwise force padded [H,W,3] materializations
    full_outputs: bool = True

    # --- tone mapping ---
    exposure_bias: float = 2.0
    tonemap: str = "uncharted2"

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.height, self.width)

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    @property
    def ray_budget(self) -> int:
        """Static number of compacted shading rays, padded to a multiple of 1024."""
        n = int(self.n_pixels * self.ray_budget_frac)
        return max(1024, (n + 1023) // 1024 * 1024)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
