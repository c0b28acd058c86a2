from . import lights, sample_shape  # noqa: F401
