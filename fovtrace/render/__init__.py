from fovtrace.render import gbuffer, shade, pipeline  # noqa: F401
