from . import (  # noqa: F401
    compaction,
    dedup,
    geometry,
    knn,
    similarity,
    spatial_join,
    text,
    tiling,
)
