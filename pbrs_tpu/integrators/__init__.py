from . import wavefront, direct  # noqa: F401
