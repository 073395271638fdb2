from . import rasterizer  # noqa: F401
