from . import textures  # noqa: F401
