from . import lineage, partitioning  # noqa: F401
