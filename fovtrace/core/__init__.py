from fovtrace.core.camera import Camera
from fovtrace.core import color, mathx, rng, reproject

__all__ = ["Camera", "color", "mathx", "rng", "reproject"]
