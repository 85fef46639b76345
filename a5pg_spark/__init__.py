"""a5pg_spark — a PySpark-native spatial-join + tiling engine around the A5
equal-area pentagonal DGGS (API parity target: decision-labs/a5pg v0.6.1).
"""

__version__ = "0.1.0"
A5_COMPAT_VERSION = "0.6.1"  # reference a5 crate version we target


def info() -> dict:
    """Mirrors ``a5pg_info()`` (``/root/reference/src/lib.rs:16-22``)."""
    return {"a5pg_spark_version": __version__, "a5_compat": A5_COMPAT_VERSION}
