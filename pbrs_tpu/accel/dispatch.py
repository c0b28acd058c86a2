"""Trace-backend selection: Pallas kernels on TPU, jnp sweep elsewhere."""

from __future__ import annotations

import jax

from ..shapes import intersect as isect_mod
from . import trace_pallas


def make_trace_fns(scene, use_pallas: bool | None = None, interpret=False):
    """Returns (intersect_fn, occlude_fn) for the scene geometry."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    geom = scene.geom
    if not use_pallas:
        return (
            lambda rays: isect_mod.intersect(geom, rays),
            lambda rays: isect_mod.occluded(geom, rays),
        )
    tracer = trace_pallas.PallasTracer(geom, interpret=interpret)

    def intersect_fn(rays):
        t, idx = tracer.trace(rays)
        return isect_mod.hit_from_t_idx(geom, rays, t, idx)

    return intersect_fn, tracer.occluded
