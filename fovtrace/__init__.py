"""fovtrace — a TPU-native differentiable foveated path tracer.

A from-scratch JAX/Pallas re-design of the capabilities of
`ohseokkwon/Foveated-Rendering-using-Ray-Tracing` (OptiX 5.1 + OpenGL):
G-buffer primary trace, saliency-driven foveated sampling, wavefront path
tracing (diffuse NEE GI, Whitted reflect/refract, HDR envmap), temporal
reprojection, and sparse-sample reconstruction (JFA Voronoi, Sibson,
pull-push pyramid, A-Trous denoise) — all as functional JAX programs with
Pallas TPU kernels on the hot paths and `shard_map` tile sharding for
multi-chip scaling.

Everything is a pure function of pytrees: no global state, no GL pipeline,
no OptiX entry-point machinery.
"""

__version__ = "0.1.0"

from fovtrace.config import RenderConfig
from fovtrace.core.camera import Camera
from fovtrace.scene.scene import Scene, Materials, ParallelogramLight

__all__ = [
    "RenderConfig",
    "Camera",
    "Scene",
    "Materials",
    "ParallelogramLight",
]
