"""Trace-backend selection: Pallas kernels on TPU, jnp sweep elsewhere."""

from __future__ import annotations

import jax

from ..shapes import intersect as isect_mod
from . import trace_pallas


def make_trace_fns(scene, use_pallas: bool | None = None, interpret=False,
                   trace_mode=None):
    """Returns (intersect_fn, occlude_fn) for the scene geometry,
    including any trace-time instance groups (accel/instanced.py).

    trace_mode: treelet kernel selection ('rowdense' row-shared dense
    visits via one-hot matmul fetch; 'rowdyn' row-shared dense visits via
    scalar-indexed dynamic fetch (no matmul) — both fastest when lanes are
    tile/Morton-ordered; None/'onehot' per-lane MXU gathers)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    geom = scene.geom
    groups = getattr(scene, "instanced", ())
    if groups:
        # Tracer-side flattening: small all-affine-exact groups bake into
        # the base tables (one trace launch instead of a per-instance
        # scan); big or non-similarity-sphere groups stay trace-time.
        from . import instanced as inst_mod

        bake = [g for g in groups if inst_mod.flattenable(g)]
        groups = tuple(g for g in groups if not inst_mod.flattenable(g))
        if bake:
            geom = inst_mod.flatten_groups(geom, bake)
    if not use_pallas:
        base_isect = lambda rays: isect_mod.intersect(geom, rays)
        base_occl = lambda rays: isect_mod.occluded(geom, rays)
    else:
        tracer = trace_pallas.PallasTracer(geom, interpret=interpret)

        def base_isect(rays):
            t, idx = tracer.trace(rays, mode=trace_mode)
            return isect_mod.hit_from_t_idx(geom, rays, t, idx)

        def base_occl(rays):
            return tracer.occluded(rays, mode=trace_mode)

    if not groups:
        return base_isect, base_occl

    from . import instanced as inst_mod

    # Per-group master tracers (t-only + any-hit), Pallas when available.
    group_fns = []
    for grp in groups:
        gg = grp.geom
        n_prims = int(gg.sph_center.shape[0] + gg.quad_origin.shape[0]
                      + gg.tri_p0.shape[0] + gg.disk_center.shape[0])
        if use_pallas and n_prims > 64:
            mtracer = trace_pallas.PallasTracer(grp.geom, interpret=interpret)
            t_fn = (lambda tr: lambda _g, r: tr.trace(r, mode=trace_mode))(
                mtracer)
            o_fn = (lambda tr: lambda _g, r: tr.occluded(r, mode=trace_mode))(
                mtracer)
        elif use_pallas:
            # Tiny master geometry (a handful of prims): the jnp sweep
            # fuses into XLA; a Pallas launch per trace costs more than
            # testing every prim on every lane.
            t_fn = inst_mod.intersect_t
            o_fn = isect_mod.occluded
        else:
            t_fn = inst_mod.intersect_t
            o_fn = isect_mod.occluded
        group_fns.append((grp, t_fn, o_fn))

    def intersect_fn(rays):
        hit = base_isect(rays)
        for grp, t_fn, _ in group_fns:
            t, inst, win = inst_mod.intersect_t_group(grp, rays, t_fn)
            gh = inst_mod.hit_from_group(grp, rays, t, inst, win)
            hit = inst_mod.merge_hits(hit, gh)
        return hit

    def occlude_fn(rays):
        blocked = base_occl(rays)
        for grp, _, o_fn in group_fns:
            blocked = blocked | inst_mod.occluded_group(grp, rays, o_fn)
        return blocked

    return intersect_fn, occlude_fn
