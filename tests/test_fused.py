"""Fused diffuse bounce kernel vs the general wavefront path (interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrs_tpu.accel import fused_kernel as fk
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets


def test_eligibility():
    assert fk.scene_supports_fused(presets.cornell_box())
    assert not fk.scene_supports_fused(presets.mixed_spheres())  # metals
    assert not fk.scene_supports_fused(presets.mesh_ball(levels=3))  # BVH
    assert not fk.scene_supports_fused(presets.plates())  # glossy


def test_fused_matches_general_path():
    scene = presets.cornell_box()
    cam = cam_mod.looking_at(
        cam_mod.make_camera((24, 24), 40.0), (278, 278, -800), (278, 278, 0),
        (0, 1, 0),
    )
    scene = scene.replace(camera=cam)
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(24 * 24)
    integ = fk.FusedDiffuseIntegrator(scene, interpret=True)
    for s in (0, 3):
        rad_f = np.asarray(
            integ.render_samples(sampler, pix, s, max_depth=5, msaa=2)
        )
        rad_j = np.asarray(wavefront.render_samples(
            scene, sampler, pix, s, max_depth=5, msaa=2
        ))
        np.testing.assert_allclose(rad_f, rad_j, atol=2e-5, rtol=1e-4)


def test_fused_ray_count_matches_general():
    scene = presets.cornell_box()
    cam = cam_mod.looking_at(
        cam_mod.make_camera((16, 16), 40.0), (278, 278, -800), (278, 278, 0),
        (0, 1, 0),
    )
    scene = scene.replace(camera=cam)
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(16 * 16)
    integ = fk.FusedDiffuseIntegrator(scene, interpret=True)
    _, cnt_f = integ.render_samples(sampler, pix, 0, max_depth=5, msaa=2,
                                    return_ray_count=True)
    _, cnt_j = wavefront.render_samples(scene, sampler, pix, 0, max_depth=5,
                                        msaa=2, return_ray_count=True)
    # Padding lanes are dead; counts match exactly.
    assert float(cnt_f) == pytest.approx(float(cnt_j), rel=1e-6)


def test_fused_matches_general_path_sobol():
    """Same equality with the Owen-scrambled Sobol' sampler: the in-kernel
    rng='sobol' draw (fused_kernel._u1) must reproduce SobolSampler's
    stream exactly (round-4 VERDICT #9)."""
    scene = presets.cornell_box()
    cam = cam_mod.looking_at(
        cam_mod.make_camera((24, 24), 40.0), (278, 278, -800), (278, 278, 0),
        (0, 1, 0),
    )
    scene = scene.replace(camera=cam)
    sampler = smp.SobolSampler(7)
    pix = jnp.arange(24 * 24)
    integ = fk.FusedDiffuseIntegrator(scene, interpret=True)
    for s in (0, 3):
        rad_f = np.asarray(
            integ.render_samples(sampler, pix, s, max_depth=5, msaa=2)
        )
        rad_j = np.asarray(wavefront.render_samples(
            scene, sampler, pix, s, max_depth=5, msaa=2
        ))
        np.testing.assert_allclose(rad_f, rad_j, atol=2e-5, rtol=1e-4)


def test_in_kernel_sobol_stream_matches_sampler():
    """Unit check of the raw u32->uniform stream for both lanes."""
    sampler = smp.SobolSampler(13)
    pix = jnp.arange(257, dtype=jnp.int32)
    for s in (0, 1, 5):
        for bounce in (0, 2):
            for dim in (smp.DIM_BSDF_UV, smp.DIM_RUSSIAN_ROULETTE):
                ref = np.asarray(sampler.u2(pix, s, bounce, dim))
                got0 = np.asarray(fk._u1(sampler.seed, pix, jnp.int32(s),
                                         bounce, dim, 0, rng="sobol"))
                got1 = np.asarray(fk._u1(sampler.seed, pix, jnp.int32(s),
                                         bounce, dim, 1, rng="sobol"))
                np.testing.assert_array_equal(got0, ref[..., 0])
                np.testing.assert_array_equal(got1, ref[..., 1])
                u1 = np.asarray(sampler.u1(pix, s, bounce, dim))
                np.testing.assert_array_equal(got0, u1)
