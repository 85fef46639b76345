from . import areas, bits, cells, dodecahedron, hilbert, projection  # noqa: F401
