from . import tables, intersect  # noqa: F401
