from fovtrace.scene.scene import (
    Scene,
    Materials,
    ParallelogramLight,
    MATL_DIFFUSE,
    MATL_REFLECTION,
    MATL_REFRACTION,
)
from fovtrace.scene import procedural, obj, image_io

__all__ = [
    "Scene",
    "Materials",
    "ParallelogramLight",
    "MATL_DIFFUSE",
    "MATL_REFLECTION",
    "MATL_REFRACTION",
    "procedural",
    "obj",
    "image_io",
]
