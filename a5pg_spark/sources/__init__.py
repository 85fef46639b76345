from . import images, polygons  # noqa: F401
