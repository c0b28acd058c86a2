from . import ray, camera, transform  # noqa: F401
