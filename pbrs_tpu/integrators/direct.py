"""Direct-lighting integrator + visualizer passes.

[ref: src/directlighting.rs:14-56, 234-289]
"""

from __future__ import annotations

import jax.numpy as jnp

from ..bxdf import bsdf as bsdf_mod
from ..core import sampler as smp
from ..core import vecmath as vm
from ..geometry import ray as ray_mod
from ..lights import lights as lt
from ..materials import table as mat_mod
from ..shapes import intersect as isect_mod
from . import nee


def direct_radiance(scene, rays, sampler, pixel_idx, sample_idx, depth=5,
                    intersect_fn=None, occlude_fn=None):
    """Emission/NEE at the first hit plus a perfect-specular reflection
    chain of up to `depth` segments. [ref: src/directlighting.rs:14-47]

    The reference recurses through its debug integrator (NEE only) for the
    specular chain; replicated here iteratively with a specular throughput.
    Deviation (COMPAT.md): the specular-chain contribution includes the
    |cos| factor the reference omits (directlighting.rs:37).
    """
    if intersect_fn is None:
        intersect_fn = lambda r: isect_mod.intersect(scene.geom, r)
    if occlude_fn is None:
        occlude_fn = lambda r: isect_mod.occluded(scene.geom, r)

    n = rays.origin.shape[0]
    radiance = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones(n, bool)

    for bounce in range(depth):
        hit = intersect_fn(rays)
        env = lt.eval_env(scene.env, rays.dir)
        radiance = radiance + jnp.where(
            (alive & ~hit.hit)[..., None], beta * env, 0.0
        )
        alive = alive & hit.hit

        lobes, emit = mat_mod.shading_at(
            scene.materials, scene.textures, hit.mat_id, hit.uv, hit.pos
        )
        emissive = (emit[..., 0] > 0.0) | (emit[..., 1] > 0.0) | (emit[..., 2] > 0.0)
        radiance = radiance + jnp.where(
            (alive & emissive)[..., None], beta * emit, 0.0
        )
        alive = alive & ~emissive

        frame = bsdf_mod.make_frame(hit.normal, hit.dpdu)
        u_sel = sampler.u1(pixel_idx, sample_idx, bounce, smp.DIM_LIGHT_SELECT)
        u_light = sampler.u2(pixel_idx, sample_idx, bounce, smp.DIM_LIGHT_UV)
        u_scatter = sampler.u2(pixel_idx, sample_idx, bounce,
                               smp.DIM_SCATTER_UV)
        if scene.num_lights > 0:
            l_direct = nee.uniform_sample_one_light(
                scene, lobes, frame, hit.pos, hit.normal, hit.wo,
                u_sel, u_light, u_scatter, occlude_fn=occlude_fn,
            )
            radiance = radiance + jnp.where(
                alive[..., None], beta * l_direct, 0.0
            )

        if bounce == depth - 1:
            break
        # Follow one perfect-specular lobe, if present.
        # [ref: directlighting.rs:33-41, src/bsdf.rs:104-113]
        f, wi, pmf, has_spec = bsdf_mod.sample_specular(lobes, frame, hit.wo)
        alive = alive & has_spec & (pmf > 0.0)
        cos_term = jnp.abs(vm.dot(wi, frame.n))
        beta = jnp.where(
            alive[..., None],
            beta * f * (cos_term * vm.weak_recip(pmf))[..., None],
            beta,
        )
        rays = ray_mod.spawn(hit.pos, hit.normal, wi)

    return radiance


def normal_visualizer(scene, rays, intersect_fn=None):
    """(albedo + normal)/2 shading. [ref: src/directlighting.rs:273-289]"""
    if intersect_fn is None:
        intersect_fn = lambda r: isect_mod.intersect(scene.geom, r)
    hit = intersect_fn(rays)
    env = lt.eval_env(scene.env, rays.dir)
    lobes = mat_mod.lobes_at(
        scene.materials, scene.textures, hit.mat_id, hit.uv, hit.pos
    )
    albedo = lobes.albedo[:, 0, :]
    shaded = (albedo + hit.normal) * 0.5
    return jnp.where(hit.hit[..., None], shaded, env)


def material_visualizer(scene, rays, intersect_fn=None):
    """Palette by material id. [ref: src/directlighting.rs:234-271]"""
    if intersect_fn is None:
        intersect_fn = lambda r: isect_mod.intersect(scene.geom, r)
    hit = intersect_fn(rays)
    palette = jnp.asarray(
        [
            [232, 207, 59], [124, 188, 126], [30, 68, 176], [15, 142, 205],
            [44, 180, 172], [216, 39, 252], [143, 112, 252], [77, 77, 77],
            [230, 230, 230], [0, 0, 0],
        ],
        jnp.float32,
    ) / 255.0
    idx = jnp.where(hit.hit, hit.mat_id % 10, 9)
    # Miss: checkerboard background on direction. [ref: directlighting.rs:262-270]
    d = vm.normalize(rays.dir)
    parity = (
        jnp.floor(d[..., 0] * 50.0) + jnp.floor(d[..., 1] * 50.0)
    ).astype(jnp.int32) % 2
    bg = jnp.where((parity == 0)[..., None], 0.9, 0.7)
    return jnp.where(hit.hit[..., None], palette[idx], bg)
