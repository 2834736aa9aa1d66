from . import neus, shading, losses  # noqa: F401
