from fovtrace.dist import sharding, train  # noqa: F401
