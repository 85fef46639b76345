from . import dedup, geometry, knn, similarity, spatial_join, text, tiling  # noqa: F401
