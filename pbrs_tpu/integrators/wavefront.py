"""Wavefront path integrator.

The reference's recursive-in-spirit bounce loop
(reference src/pathintegrator.rs:9-74) becomes a breadth-first loop over the
whole ray batch: every bounce runs intersect -> emission -> NEE -> BSDF
sample -> Russian roulette on all lanes, with terminated lanes masked. The
bounce loop is a `lax.fori_loop` so the compiled graph is one bounce deep
regardless of max_depth.

Fixes vs reference (COMPAT.md): throughput uses |cos| (pathintegrator.rs:61
uses the signed dot, which corrupts transmission paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import radiometry
from ..bxdf import bsdf as bsdf_mod
from ..core import sampler as smp
from ..core import vecmath as vm
from ..geometry import camera as cam_mod
from ..geometry import ray as ray_mod
from ..lights import lights as lt
from ..materials import table as mat_mod
from ..shapes import intersect as isect_mod
from . import nee


def camera_rays(scene, sampler, pixel_idx, sample_idx, msaa,
                filter_inv_cdf=None):
    """Camera ray batch; the per-sample jitter is stratified and, when a
    reconstruction filter is given, warped through its inverse CDF (filter
    importance sampling — the reference parses filters but never applies
    them, src/main.rs:208). Non-negative filters carry weight 1; filters
    with negative lobes (Mitchell/Lanczos) use weighted FIS, and the
    per-sample weight is returned by camera_rays_weighted."""
    rays, _ = camera_rays_weighted(
        scene, sampler, pixel_idx, sample_idx, msaa, filter_inv_cdf
    )
    return rays


def camera_rays_weighted(scene, sampler, pixel_idx, sample_idx, msaa,
                         filter_table=None):
    """Like camera_rays, but returns (rays, weight) — weight is None for a
    box/unweighted filter, else the per-sample signed FIS weight [N]."""
    row, col = cam_mod.pixel_coords(scene.camera, pixel_idx)
    dx, dy = smp.stratified_jitter(sampler, pixel_idx, sample_idx, msaa)
    weight = None
    if filter_table is not None:
        from ..core import filters as flt

        ox, wx = flt.sample_filter_offset(filter_table, dx)
        oy, wy = flt.sample_filter_offset(filter_table, dy)
        dx = 0.5 + ox
        dy = 0.5 + oy
        if wx is not None:
            weight = wx * wy
    rays = cam_mod.shoot_rays(
        scene.camera, row, col, jnp.stack([dx, dy], axis=-1)
    )
    return rays, weight


def path_radiance(scene, rays, sampler, pixel_idx, sample_idx, max_depth=5,
                  rr_start=3, intersect_fn=None, occlude_fn=None,
                  use_nee=True, return_ray_count=False):
    """Estimate radiance along camera rays. Returns [N,3].

    Every bounce, all lanes: closest-hit, emission on camera/post-delta
    segments, one-light NEE with MIS, BSDF sampling, Russian roulette after
    `rr_start`. [ref: src/pathintegrator.rs:9-74]
    """
    if intersect_fn is None:
        intersect_fn = lambda r: isect_mod.intersect(scene.geom, r)
    if occlude_fn is None:
        occlude_fn = lambda r: isect_mod.occluded(scene.geom, r)

    n = rays.origin.shape[0]

    def body(bounce, state):
        rays, radiance, beta, alive, specular_bounce, ray_count = state
        # Closest-hit rays this bounce = currently-alive lanes.
        ray_count = ray_count + jnp.sum(alive.astype(jnp.float32))
        hit = intersect_fn(rays)

        # Shading setup: one packed material lookup yields lobes + emission.
        lobes, emit = mat_mod.shading_at(
            scene.materials, scene.textures, hit.mat_id, hit.uv, hit.pos
        )
        # Emitted light at the hit (or escape to the environment) counts only
        # on camera rays and after delta bounces; NEE covers the rest.
        # [ref: pathintegrator.rs:19-22]
        env = lt.eval_env(scene.env, rays.dir)
        direct_seen = jnp.where(hit.hit[..., None], emit, env)
        if use_nee:
            count_emission = alive & ((bounce == 0) | specular_bounce)
        else:
            # Brute-force mode (validation): emission counted on every
            # segment, no NEE. Converges to the same image as NEE+MIS.
            count_emission = alive
        radiance = radiance + jnp.where(
            count_emission[..., None], beta * direct_seen, 0.0
        )

        alive = alive & hit.hit

        frame = bsdf_mod.make_frame(hit.normal, hit.dpdu)
        wo = hit.wo

        # Next-event estimation. [ref: pathintegrator.rs:35]
        if use_nee and scene.num_lights > 0:
            u_sel = sampler.u1(pixel_idx, sample_idx, bounce,
                               smp.DIM_LIGHT_SELECT)
            u_light = sampler.u2(pixel_idx, sample_idx, bounce,
                                 smp.DIM_LIGHT_UV)
            u_scatter = sampler.u2(pixel_idx, sample_idx, bounce,
                                   smp.DIM_SCATTER_UV)
            l_direct = nee.uniform_sample_one_light(
                scene, lobes, frame, hit.pos, hit.normal, wo,
                u_sel, u_light, u_scatter, occlude_fn=occlude_fn,
                alive=alive,
            )
            radiance = radiance + jnp.where(
                alive[..., None], beta * l_direct, 0.0
            )
            # Two shadow batches per alive lane (light-sampled + BSDF-sampled).
            ray_count = ray_count + 2.0 * jnp.sum(alive.astype(jnp.float32))

        # Sample the BSDF for the next direction. [ref: pathintegrator.rs:38-62]
        u_bsdf = sampler.u2(pixel_idx, sample_idx, bounce, smp.DIM_BSDF_UV)
        f, wi, pdf, is_delta = bsdf_mod.sample_bsdf(lobes, frame, wo, u_bsdf)
        cos_term = jnp.abs(vm.dot(wi, frame.n))
        step_ok = (pdf > 0.0) & (
            (f[..., 0] > 0.0) | (f[..., 1] > 0.0) | (f[..., 2] > 0.0)
        )
        alive = alive & step_ok
        beta = jnp.where(
            alive[..., None],
            beta * f * (cos_term * vm.weak_recip(pdf))[..., None],
            beta,
        )
        rays = ray_mod.spawn(hit.pos, hit.normal, wi)

        # Russian roulette. [ref: pathintegrator.rs:65-71]
        q = jnp.maximum(0.05, 1.0 - radiometry.luminance(beta))
        u_rr = sampler.u1(pixel_idx, sample_idx, bounce,
                          smp.DIM_RUSSIAN_ROULETTE)
        rr_active = bounce > rr_start
        killed = rr_active & (u_rr < q)
        alive = alive & ~killed
        rr_scale = jnp.where(
            rr_active & alive, 1.0 / jnp.maximum(1.0 - q, 1e-6), 1.0
        )
        beta = beta * rr_scale[..., None]
        # Dead lanes get t_max=0 so traversal-ordered tracers never walk
        # them on later bounces (the flat sweep masks them anyway).
        rays = rays.replace(t_max=jnp.where(alive, rays.t_max, 0.0))

        return rays, radiance, beta, alive, is_delta, ray_count

    state = (
        rays,
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n, 3), jnp.float32),
        jnp.ones(n, bool),
        jnp.zeros(n, bool),
        jnp.zeros((), jnp.float32),
    )
    state = jax.lax.fori_loop(0, max_depth, body, state)
    if return_ray_count:
        return state[1], state[5]
    return state[1]


def render_samples(scene, sampler, pixel_idx, sample_idx, max_depth=5, msaa=2,
                   intersect_fn=None, occlude_fn=None, use_nee=True,
                   return_ray_count=False, filter_inv_cdf=None):
    """Camera rays + path integration for a (pixel, sample) batch."""
    rays, weight = camera_rays_weighted(
        scene, sampler, pixel_idx, sample_idx, msaa, filter_inv_cdf
    )
    out = path_radiance(
        scene, rays, sampler, pixel_idx, sample_idx, max_depth=max_depth,
        intersect_fn=intersect_fn, occlude_fn=occlude_fn, use_nee=use_nee,
        return_ray_count=return_ray_count,
    )
    if weight is None:
        return out
    if return_ray_count:
        return out[0] * weight[..., None], out[1]
    return out * weight[..., None]
