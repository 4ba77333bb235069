from fovtrace.kernels import intersect  # noqa: F401
