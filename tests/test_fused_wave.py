"""Shade-megakernel (external trace) vs the general wavefront path on
identical RNG streams — the same exact-equality methodology as the other
fused kernels, over the material/light/texture set that only this path
covers (FresnelBlend, Oren-Nayar, delta+smooth mixtures, image textures,
image environments)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrs_tpu.accel import dispatch as trace_dispatch
from pbrs_tpu.accel import fused_wave as fw
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.lights import lights as lt
from pbrs_tpu.scene import presets
from pbrs_tpu.scene.buffers import SceneBuilder


def _zoo_scene():
    """Everything the wave path adds: substrate (FresnelBlend), sigma>0
    matte (Oren-Nayar), full uber (delta+smooth mixture), image + checker
    textures, an image environment, delta lights, and shaped area lights."""
    b = SceneBuilder()
    g = b.geometry
    rng = np.random.default_rng(5)
    img = rng.random((8, 8, 3)).astype(np.float32)
    tex_img = b.textures.add_image(img)
    tex_chk = b.textures.add_checker((0.7, 0.7, 0.2), (0.1, 0.1, 0.4))
    floor = b.materials.add_lambertian(tex_id=tex_img)
    g.add_quad((-12, 0, -12), (24, 0, 0), (0, 0, 24), floor)
    g.add_sphere((-4.5, 1, 0), 1.0,
                 b.materials.add_substrate((0.5, 0.3, 0.2), (0.3, 0.3, 0.3),
                                           0.08))
    g.add_sphere((-1.5, 1, 0), 1.0,
                 b.materials.add_matte((0.6, 0.5, 0.4), sigma_deg=20.0))
    g.add_sphere((1.5, 1, 0), 1.0, b.materials.add_uber(
        (0.3, 0.4, 0.5), (0.4, 0.4, 0.4), roughness=0.1, opacity=0.7))
    g.add_sphere((4.5, 1, 0), 1.0, b.materials.add_dielectric(1.5))
    g.add_sphere((0.0, 1, -3), 1.0, b.materials.add_mirror((0.9, 0.9, 0.9)))
    checker_mat = b.materials.add_lambertian(tex_id=tex_chk)
    g.add_triangle((-3, 0.01, -5), (0, 0.01, -3), (-1.5, 2.5, -4),
                   checker_mat)

    light_c = (6.0, 6.0, 6.0)
    light = b.materials.add_diffuse_light(light_c)
    g.add_quad((-2, 7, -2), (4, 0, 0), (0, 0, 4), light)
    b.lights.add_area_quad(light_c, (-2, 7, -2), (4, 0, 0), (0, 0, 4))
    c2 = (8.0, 7.0, 6.0)
    m2 = b.materials.add_diffuse_light(c2)
    g.add_sphere((-4, 5, -5), 0.8, m2)
    b.lights.add_area_sphere(c2, (-4, 5, -5), 0.8)
    b.lights.add_point((6, 5, -6), (40, 35, 30))
    b.lights.add_distant((0.3, -1.0, 0.2), (0.5, 0.5, 0.55))
    env = rng.random((8, 16, 3)).astype(np.float32)
    b.lights.env = lt.make_env_image(env, scale=(1.5, 1.5, 1.5))

    cam = cam_mod.make_camera((24, 24), 45.0)
    b.camera = cam_mod.looking_at(cam, (0, 4, -14), (0, 1.5, 0), (0, 1, 0))
    return b.build()


def _center_pix(scene, pix_n):
    """A pix_n x pix_n block at the image center. arange(n) picks the top
    rows, which in a full-res preset (cornell is 600x600) see only
    background — equality there is vacuous. Center pixels are lit, and the
    compare helpers assert that."""
    w, h = scene.camera.width, scene.camera.height
    if w <= pix_n and h <= pix_n:
        return jnp.arange(pix_n * pix_n)
    ys, xs = np.mgrid[h // 2 - pix_n // 2:h // 2 + (pix_n + 1) // 2,
                      w // 2 - pix_n // 2:w // 2 + (pix_n + 1) // 2]
    return jnp.asarray((ys * w + xs).ravel())


def test_eligibility():
    assert fw.scene_supports_wave(_zoo_scene())
    assert fw.scene_supports_wave(presets.cornell_box())
    assert fw.scene_supports_wave(presets.mesh_ball(levels=2))
    assert fw.scene_supports_wave(presets.two_perlin_spheres())


def _compare(scene, pix_n=24, depth=5, samples=(0, 3), atol=3e-5,
             sampler=None):
    sampler = sampler if sampler is not None else smp.PCGSampler(0)
    pix = _center_pix(scene, pix_n)
    isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene,
                                                      use_pallas=False)
    integ = fw.FusedWaveIntegrator(scene, interpret=True, use_pallas=False)
    for s in samples:
        rad_f = np.asarray(
            integ.render_samples(sampler, pix, s, max_depth=depth, msaa=2)
        )
        rad_j = np.asarray(wavefront.render_samples(
            scene, sampler, pix, s, max_depth=depth, msaa=2,
            intersect_fn=isect_fn, occlude_fn=occl_fn,
        ))
        assert rad_j.sum() > 0.0  # non-vacuous: the block must be lit
        np.testing.assert_allclose(rad_f, rad_j, atol=atol, rtol=2e-4)


def test_cornell_matches_general_path():
    _compare(presets.cornell_box(), pix_n=20, depth=4, samples=(0,))


@pytest.mark.slow
def test_zoo_matches_general_path():
    _compare(_zoo_scene(), depth=4)


def test_ray_counts_match_general_path():
    scene = presets.cornell_box()
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(16 * 16)
    isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene,
                                                      use_pallas=False)
    integ = fw.FusedWaveIntegrator(scene, interpret=True, use_pallas=False)
    _, cnt_f = integ.render_samples(sampler, pix, 0, max_depth=3, msaa=2,
                                    return_ray_count=True)
    _, cnt_j = wavefront.render_samples(
        scene, sampler, pix, 0, max_depth=3, msaa=2,
        intersect_fn=isect_fn, occlude_fn=occl_fn, return_ray_count=True)
    assert float(cnt_f) == float(cnt_j)


def _compare_folded(scene, pix_n=24, depth=5, samples=(0,), atol=3e-5):
    """Wave-folded vs general-folded on identical RNG streams: the folded
    estimator (BSDF-sampled MIS arm resolved by the next bounce's closest
    hit) must agree between the megakernel and the jnp wavefront."""
    sampler = smp.PCGSampler(0)
    pix = _center_pix(scene, pix_n)
    isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene,
                                                      use_pallas=False)
    integ = fw.FusedWaveIntegrator(scene, interpret=True, use_pallas=False,
                                   folded=True)
    for s in samples:
        rad_f = np.asarray(
            integ.render_samples(sampler, pix, s, max_depth=depth, msaa=2)
        )
        rad_j = np.asarray(wavefront.render_samples(
            scene, sampler, pix, s, max_depth=depth, msaa=2,
            intersect_fn=isect_fn, occlude_fn=occl_fn, nee_mode="folded",
        ))
        assert rad_j.sum() > 0.0  # non-vacuous: the block must be lit
        np.testing.assert_allclose(rad_f, rad_j, atol=atol, rtol=2e-4)


def test_folded_cornell_matches_general_folded():
    _compare_folded(presets.cornell_box(), pix_n=20, depth=4)


@pytest.mark.slow
def test_folded_zoo_matches_general_folded():
    _compare_folded(_zoo_scene(), depth=4)


def test_folded_ray_counts_match_general_folded():
    scene = presets.cornell_box()
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(16 * 16)
    isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene,
                                                      use_pallas=False)
    integ = fw.FusedWaveIntegrator(scene, interpret=True, use_pallas=False,
                                   folded=True)
    _, cnt_f = integ.render_samples(sampler, pix, 0, max_depth=3, msaa=2,
                                    return_ray_count=True)
    _, cnt_j = wavefront.render_samples(
        scene, sampler, pix, 0, max_depth=3, msaa=2,
        intersect_fn=isect_fn, occlude_fn=occl_fn, nee_mode="folded",
        return_ray_count=True)
    assert float(cnt_f) == float(cnt_j)


def test_folded_compacted_matches_folded_masked_wave():
    """Open scene + folded-lagged measured schedule: the capacity margin
    holds (keep probability 1, including the blocks that only owe a
    pending resolution), so the compacted folded wave must equal the
    masked folded wave exactly. A closed scene (cornell) cannot shrink
    without roulette — that comparison would be testing variance, not the
    compaction plumbing."""
    from pbrs_tpu.geometry import camera as cam_mod

    scene = presets.mesh_ball(levels=2)
    cam = scene.camera
    fresh = cam_mod.make_camera((32, 24), 35.0)
    scene = scene.replace(camera=fresh.replace(
        center=cam.center, orientation=cam.orientation, c=cam.c,
        a=cam.a * (cam.width // 2) / 16, b=cam.b * (cam.height // 2) / 12,
    ))
    sampler = smp.PCGSampler(7)
    n = 32 * 24
    pix = jnp.arange(n, dtype=jnp.int32)
    depth = 4

    counts = np.asarray(wavefront.measure_alive(
        scene, sampler, pix, 0, max_depth=depth, msaa=2))
    lagged = np.maximum(counts, np.concatenate([counts[:1], counts[:-1]]))
    sched = wavefront.auto_schedule(lagged, n, min_cap=128, quantum=64)
    assert any(c < n for c in sched[1:]), (sched, counts)

    integ = fw.FusedWaveIntegrator(scene, interpret=True, use_pallas=False,
                                   folded=True)
    rad_m = np.asarray(
        integ.render_samples(sampler, pix, 0, max_depth=depth, msaa=2))
    assert rad_m.sum() > 0.0  # non-vacuous
    rad_c = np.asarray(integ.render_samples_compacted(
        sampler, pix, 0, sched, max_depth=depth, msaa=2))
    np.testing.assert_allclose(rad_c, rad_m, atol=3e-5, rtol=2e-4)


def test_cornell_sobol_matches_general_path():
    """rng='sobol' threading through the wave shade kernel (VERDICT r4 #9)."""
    _compare(presets.cornell_box(), pix_n=16, depth=3, samples=(0,),
             sampler=smp.SobolSampler(3))


def test_fourier_wave_matches_general_path():
    """Fourier materials in the wave integrator: the external shade
    override (FusedWaveIntegrator._fourier_override) must reproduce the
    general path exactly on identical RNG (round-4 VERDICT #4)."""
    scene = presets.fourier_plastic()
    assert fw.scene_supports_wave(scene)
    assert not fw.scene_supports_wave_folded(scene)
    _compare(scene, pix_n=16, depth=3, samples=(0,))


def test_fourier_folded_constructor_rejected():
    scene = presets.fourier_plastic()
    with pytest.raises(ValueError):
        fw.FusedWaveIntegrator(scene, folded=True, interpret=True,
                               use_pallas=False)
