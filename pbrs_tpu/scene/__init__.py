from . import buffers, presets  # noqa: F401
