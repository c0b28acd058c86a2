from . import trace_pallas, dispatch  # noqa: F401
