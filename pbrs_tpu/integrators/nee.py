"""Next-event estimation with multiple importance sampling, vectorized.

One light is chosen uniformly per ray among delta + area + env
(reference src/directlighting.rs:58-99, with the env-arm index bug at
directlighting.rs:76 fixed); the three arms are computed branchlessly and
mask-combined. Two shadow batches per call: one for the light-sampled
direction, one for the BSDF-sampled direction (shared by the area-MIS
second arm and the env arm).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..bxdf import bsdf as bsdf_mod
from ..core import vecmath as vm
from ..geometry import ray as ray_mod
from ..lights import lights as lt
from ..shapes import intersect as isect_mod


def _power2_heuristic(f_pdf, g_pdf):
    """[ref: src/directlighting.rs:224-232]"""
    f2 = f_pdf * f_pdf
    g2 = g_pdf * g_pdf
    return f2 / jnp.maximum(f2 + g2, 1e-30)


def uniform_sample_one_light(
    scene, lobes, frame, hit_pos, hit_normal, wo, u_select, u_light, u_scatter,
    occlude_fn=None, alive=None, path_sample=None,
):
    """Estimate direct lighting at shading points.

    All inputs are [N]-batched; returns radiance [N,3]. `occlude_fn(rays)`
    performs the any-hit query (defaults to brute-force table occlusion).
    `alive` masks lanes whose result is discarded: their shadow rays get
    t_max=0, so traversal-ordered tracers skip them outright.

    path_sample: FOLDED mode. Pass the path's own BSDF sample
    (f, wi, pdf, is_delta) and the function returns
    (light_arm_radiance, pending): the BSDF-sampled MIS arm is NOT traced
    here — its visibility is resolved by the NEXT bounce's closest hit
    (the continuation ray IS the arm's sample), which removes one of the
    two shadow traversals per bounce. `pending` is a dict of
    {coeff [N,3], t_light [N], is_env [N]}: at the next hit add
    coeff * env(dir) where is_env & the ray escaped, and coeff where
    ~is_env & hit.t >= t_light (the chosen light was the closest thing
    along the ray). This is PBRT's one-sample path-integrator fold; the
    reference traces a second occlusion ray instead
    (src/directlighting.rs:155-222) — estimator expectation identical.
    """

    def mask_dead(rays):
        if alive is None:
            return rays
        return rays.replace(t_max=jnp.where(alive, rays.t_max, 0.0))
    if occlude_fn is None:
        occlude_fn = lambda rays: isect_mod.occluded(scene.geom, rays)

    n_delta = scene.delta_lights.count
    n_area = scene.area_lights.count
    has_env = 1 if scene.env.kind != lt.ENV_NONE else 0
    n_lights = n_delta + n_area + has_env
    if n_lights == 0:
        return jnp.zeros_like(hit_pos)

    chosen = jnp.minimum(
        (u_select * n_lights).astype(jnp.int32), n_lights - 1
    )
    arm_delta = chosen < n_delta
    arm_area = (chosen >= n_delta) & (chosen < n_delta + n_area)
    arm_env = chosen >= n_delta + n_area

    zero3 = jnp.zeros_like(hit_pos)
    result = zero3
    # Env importance sampling (parity-plus: the reference env light is
    # BSDF-sampled only, directlighting.rs:93-99). When the image env
    # carries a distribution, the env arm gets a light-sampled leg too and
    # both legs MIS-combine with the power-2 heuristic.
    env_is = bool(has_env) and getattr(scene.env, "dist", None) is not None

    # ------------- light-sampled arm (delta + area + env-IS) -------------
    if n_delta + n_area > 0 or env_is:
        if n_delta > 0:
            d_idx = jnp.clip(chosen, 0, n_delta - 1)
            li_d, wi_d, target_d = lt.sample_delta(
                scene.delta_lights, d_idx, hit_pos
            )
        if n_area > 0:
            a_idx = jnp.clip(chosen - n_delta, 0, n_area - 1)
            li_a, wi_a, pdf_a, pt_a = lt.sample_area(
                scene.area_lights, a_idx, hit_pos, u_light
            )
        li_l = zero3
        wi_l = jnp.zeros_like(hit_pos).at[..., 2].set(1.0)
        target_l = hit_pos
        pdf_l = jnp.ones(hit_pos.shape[0], hit_pos.dtype)
        if n_delta > 0:
            li_l = jnp.where(arm_delta[..., None], li_d, li_l)
            wi_l = jnp.where(arm_delta[..., None], wi_d, wi_l)
            target_l = jnp.where(arm_delta[..., None], target_d, target_l)
        if n_area > 0:
            li_l = jnp.where(arm_area[..., None], li_a, li_l)
            wi_l = jnp.where(arm_area[..., None], wi_a, wi_l)
            target_l = jnp.where(arm_area[..., None], pt_a, target_l)
            pdf_l = jnp.where(arm_area, pdf_a, pdf_l)
        if env_is:
            from ..lights import env_sampling as es

            wi_e, li_e, pdf_e = es.sample_env(scene.env.dist, u_light)
            li_l = jnp.where(arm_env[..., None], li_e, li_l)
            wi_l = jnp.where(arm_env[..., None], wi_e, wi_l)
            pdf_l = jnp.where(arm_env, pdf_e, pdf_l)

        f_l = bsdf_mod.eval_bsdf(lobes, frame, wo, wi_l) * jnp.abs(
            vm.dot(hit_normal, wi_l)
        )[..., None]
        scatter_pdf = bsdf_mod.pdf_bsdf(lobes, frame, wo, wi_l)
        shadow = ray_mod.spawn_limited_to(hit_pos, hit_normal, target_l)
        if env_is:
            # Env-arm visibility is an unbounded ray along wi_e.
            unb = ray_mod.spawn(hit_pos, hit_normal, wi_l)
            shadow = ray_mod.RayBatch(
                origin=jnp.where(arm_env[..., None], unb.origin,
                                 shadow.origin),
                dir=jnp.where(arm_env[..., None], unb.dir, shadow.dir),
                t_max=jnp.where(arm_env, unb.t_max, shadow.t_max),
            )
        occluded_l = occlude_fn(mask_dead(shadow))
        # MIS weight: 1 for delta lights (mass), power-2 otherwise.
        # [ref: src/directlighting.rs:141-145, 192]
        weight = jnp.where(
            arm_delta, 1.0, _power2_heuristic(pdf_l, scatter_pdf)
        )
        arm_sampled = arm_delta | arm_area
        if env_is:
            arm_sampled = arm_sampled | arm_env
        valid = (
            arm_sampled
            & ~occluded_l
            & (pdf_l > 0.0)
            & ((li_l[..., 0] > 0.0) | (li_l[..., 1] > 0.0) | (li_l[..., 2] > 0.0))
        )
        contrib = f_l * li_l * (weight * vm.weak_recip(pdf_l))[..., None]
        result = result + jnp.where(valid[..., None], contrib, 0.0)

    # ---------------- BSDF-sampled arm (area MIS + env) ----------------
    pending = None
    if (n_area > 0 or has_env) and path_sample is not None:
        # Folded: the path's continuation sample IS the arm's sample; the
        # next trace resolves visibility. Build the pending coefficients.
        f_b, wi_b, pdf_b, is_delta_b = path_sample
        f_b = f_b * jnp.abs(vm.dot(hit_normal, wi_b))[..., None]
        coeff = jnp.zeros_like(hit_pos)
        t_light = jnp.zeros(hit_pos.shape[0], hit_pos.dtype)
        is_env_p = jnp.zeros(hit_pos.shape[0], bool)
        if n_area > 0:
            a_idx = jnp.clip(chosen - n_delta, 0, n_area - 1)
            li_b, pdf_light_b, hit_light, pt_b = lt.area_radiance_to(
                scene.area_lights, a_idx, hit_pos, wi_b
            )
            weight_b = _power2_heuristic(pdf_b, pdf_light_b)
            valid_b = (
                arm_area & hit_light & ~is_delta_b & (pdf_b > 0.0)
                & (pdf_light_b > 0.0)
                & ((f_b[..., 0] > 0.0) | (f_b[..., 1] > 0.0)
                   | (f_b[..., 2] > 0.0))
            )
            contrib_b = f_b * li_b * (
                weight_b * vm.weak_recip(pdf_b))[..., None] * float(n_lights)
            coeff = jnp.where(valid_b[..., None], contrib_b, coeff)
            # Distance along the continuation ray (spawned the same way)
            # to the analytic light point; next-hit t >= this means the
            # chosen light was the closest thing along the sample.
            org = ray_mod.spawn(hit_pos, hit_normal, wi_b).origin
            t_light = jnp.where(
                valid_b, vm.dot(pt_b - org, wi_b), t_light)
        if has_env:
            # The env leg's radiance is eval_env(wi_b) — which the next
            # bounce computes anyway (its escape term, same direction), so
            # the coefficient EXCLUDES it and the resolve multiplies it in.
            # Env-IS: the MIS weight is ALSO deferred — the BSDF pdf rides
            # the (otherwise unused) t_light slot and the resolver gets
            # pdf_env(wi_b) for free from the same texel gather as the
            # escape term (wavefront._resolve_pending p_env). This bounce
            # never pays a pdf_env gather pass.
            valid_e = arm_env & ~is_delta_b & (pdf_b > 0.0)
            ce = f_b * vm.weak_recip(pdf_b)[..., None] * float(n_lights)
            coeff = jnp.where(valid_e[..., None], ce, coeff)
            if env_is:
                t_light = jnp.where(valid_e, pdf_b, t_light)
            is_env_p = valid_e
        pending = {"coeff": coeff, "t_light": t_light, "is_env": is_env_p}
        return result * float(n_lights), pending
    if path_sample is not None:
        return result * float(n_lights), {
            "coeff": jnp.zeros_like(hit_pos),
            "t_light": jnp.zeros(hit_pos.shape[0], hit_pos.dtype),
            "is_env": jnp.zeros(hit_pos.shape[0], bool),
        }
    if n_area > 0 or has_env:
        f_b, wi_b, pdf_b, is_delta_b = bsdf_mod.sample_bsdf(
            lobes, frame, wo, u_scatter
        )
        f_b = f_b * jnp.abs(vm.dot(hit_normal, wi_b))[..., None]

        if n_area > 0:
            a_idx = jnp.clip(chosen - n_delta, 0, n_area - 1)
            li_b, pdf_light_b, hit_light, pt_b = lt.area_radiance_to(
                scene.area_lights, a_idx, hit_pos, wi_b
            )
        else:
            li_b = zero3
            pdf_light_b = jnp.zeros(hit_pos.shape[0], hit_pos.dtype)
            hit_light = jnp.zeros(hit_pos.shape[0], bool)
            pt_b = hit_pos

        # Shared shadow batch: bounded to the light point on the area arm,
        # unbounded on the env arm.
        shadow_b = ray_mod.spawn_limited_to(hit_pos, hit_normal, pt_b)
        env_dir_rays = ray_mod.spawn(hit_pos, hit_normal, wi_b)
        shadow_dir = jnp.where(arm_env[..., None], env_dir_rays.dir, shadow_b.dir)
        shadow_tmax = jnp.where(arm_env, env_dir_rays.t_max, shadow_b.t_max)
        shadow2 = ray_mod.RayBatch(
            origin=jnp.where(arm_env[..., None], env_dir_rays.origin,
                             shadow_b.origin),
            dir=shadow_dir,
            t_max=shadow_tmax,
        )
        occluded_b = occlude_fn(mask_dead(shadow2))

        if n_area > 0:
            weight_b = _power2_heuristic(pdf_b, pdf_light_b)
            # Delta-sampled directions are excluded from the NEE BSDF arm
            # (pbrt EstimateDirect semantics: non-specular lobes only) —
            # light seen through a delta lobe is accounted for by the
            # emission-after-specular-bounce rule in the path loop, so
            # counting it here too would double it. The reference has this
            # latent bug (directlighting.rs Prob::Mass => weight 1);
            # COMPAT.md #15.
            valid_b = (
                arm_area
                & hit_light
                & ~is_delta_b
                & ~occluded_b
                & (pdf_b > 0.0)
                & (pdf_light_b > 0.0)
                & ((f_b[..., 0] > 0.0) | (f_b[..., 1] > 0.0) | (f_b[..., 2] > 0.0))
            )
            contrib_b = f_b * li_b * (weight_b * vm.weak_recip(pdf_b))[..., None]
            result = result + jnp.where(valid_b[..., None], contrib_b, 0.0)

        if has_env:
            # ~is_delta_b: same double-count exclusion as the area arm.
            valid_e = arm_env & ~is_delta_b & ~occluded_b & (pdf_b > 0.0)
            if env_is:
                from ..lights import env_sampling as es

                # One texel gather for radiance + pdf (same row/col).
                li_env, p_e = es.eval_env_pdf(scene.env, wi_b)
                weight_e = _power2_heuristic(pdf_b, p_e)
            else:
                li_env = lt.eval_env(scene.env, wi_b)
                weight_e = 1.0
            contrib_e = f_b * li_env * (
                weight_e * vm.weak_recip(pdf_b))[..., None]
            result = result + jnp.where(valid_e[..., None], contrib_e, 0.0)

    # 1 / light_pdf = n_lights. [ref: src/directlighting.rs:98]
    return result * float(n_lights)
