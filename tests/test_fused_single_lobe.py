"""Generalized single-lobe bounce kernel vs the general wavefront path
(interpret mode): microfacet metals/glossy, mirror, dielectric, delta
lights, triangles/disks, dusk env — same RNG streams, same estimator."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrs_tpu.accel import fused_kernel as fk
from pbrs_tpu.accel import fused_single_lobe as fsl
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets
from pbrs_tpu.scene.buffers import SceneBuilder


def _zoo_scene():
    """Every supported single-lobe kind + delta lights + quad light +
    gradient env + tri/disk primitives in one frame."""
    b = SceneBuilder()
    g = b.geometry
    floor = b.materials.add_lambertian((0.6, 0.55, 0.5))
    g.add_quad((-12, 0, -12), (24, 0, 0), (0, 0, 24), floor)
    g.add_sphere((-4.5, 1, 0), 1.0, b.materials.add_metal(
        presets.GOLD[0], presets.GOLD[1], 0.2))
    g.add_sphere((-1.5, 1, 0), 1.0, b.materials.add_glossy(
        (0.8, 0.8, 0.9), 0.05))
    g.add_sphere((1.5, 1, 0), 1.0, b.materials.add_mirror((0.95, 0.95, 0.95)))
    g.add_sphere((4.5, 1, 0), 1.0, b.materials.add_dielectric(1.5))
    red = b.materials.add_lambertian((0.7, 0.2, 0.2))
    g.add_triangle((-3, 0.01, -4), (0, 0.01, -2), (-1.5, 2.5, -3), red)
    g.add_disk((2.5, 1.2, -3.5), (0, 0.3, -1), (1.2, 0, 0), red)

    light_c = (6.0, 6.0, 6.0)
    light = b.materials.add_diffuse_light(light_c)
    g.add_quad((-2, 7, -2), (4, 0, 0), (0, 0, 4), light)
    b.lights.add_area_quad(light_c, (-2, 7, -2), (4, 0, 0), (0, 0, 4))
    b.lights.add_point((6, 5, -6), (40, 35, 30))
    b.lights.add_distant((0.3, -1.0, 0.2), (0.5, 0.5, 0.55))
    b.lights.env = presets.BLUE_SKY

    cam = cam_mod.make_camera((24, 24), 45.0)
    b.camera = cam_mod.looking_at(cam, (0, 4, -14), (0, 1.5, 0), (0, 1, 0))
    return b.build()


def _shrunk(scene, size=20):
    cam = scene.camera
    fresh = cam_mod.make_camera((size, size), 40.0)
    return scene.replace(camera=fresh.replace(
        center=cam.center, orientation=cam.orientation,
        a=cam.a * ((cam.width // 2) / (size // 2)),
        b=cam.b * ((cam.height // 2) / (size // 2)),
        c=cam.c,
    ))


def test_eligibility():
    assert fsl.scene_supports_single_lobe(_zoo_scene())
    assert fsl.scene_supports_single_lobe(presets.cornell_box())
    assert fsl.scene_supports_single_lobe(presets.env_mapped())  # dusk env
    assert fsl.scene_supports_single_lobe(presets.plates())  # sphere lights
    # 485 spheres / 485 materials: flat loops still beat the BVH path
    assert fsl.scene_supports_single_lobe(presets.mixed_spheres())
    # procedural textures evaluate in-kernel now (image textures are
    # covered by test_image_texture_stays_general)
    assert fsl.scene_supports_single_lobe(presets.two_perlin_spheres())
    # multi-lobe (glass mesh + BVH-scale tris) -> general path
    assert not fsl.scene_supports_single_lobe(presets.mesh_ball(levels=3))


def _compare(scene, pix_n=24, depth=5, samples=(0, 3), atol=3e-5,
             sampler=None):
    sampler = sampler if sampler is not None else smp.PCGSampler(0)
    pix = jnp.arange(pix_n * pix_n)
    integ = fsl.FusedSingleLobeIntegrator(scene, interpret=True)
    for s in samples:
        rad_f = np.asarray(
            integ.render_samples(sampler, pix, s, max_depth=depth, msaa=2)
        )
        rad_j = np.asarray(wavefront.render_samples(
            scene, sampler, pix, s, max_depth=depth, msaa=2
        ))
        np.testing.assert_allclose(rad_f, rad_j, atol=atol, rtol=2e-4)


def test_zoo_matches_general_path():
    _compare(_zoo_scene())


def _shaped_lights_scene():
    """Sphere + disk + triangle area lights over glossy/lambert geometry —
    exercises the per-shape NEE arms (cone sampling, concentric disk,
    triangle fold) in the kernel."""
    b = SceneBuilder()
    g = b.geometry
    floor = b.materials.add_lambertian((0.55, 0.55, 0.6))
    g.add_quad((-12, 0, -12), (24, 0, 0), (0, 0, 24), floor)
    g.add_sphere((-2, 1, 0), 1.0, b.materials.add_glossy((0.85, 0.8, 0.7),
                                                         0.03))
    g.add_sphere((2, 1, 0), 1.0, b.materials.add_lambertian((0.3, 0.5, 0.7)))

    c1 = (8.0, 7.0, 6.0)
    m1 = b.materials.add_diffuse_light(c1)
    g.add_sphere((-4, 5, -3), 0.8, m1)
    b.lights.add_area_sphere(c1, (-4, 5, -3), 0.8)
    c2 = (5.0, 6.0, 8.0)
    m2 = b.materials.add_diffuse_light(c2)
    g.add_disk((4, 6, -2), (0, -1, 0.2), (1.5, 0, 0), m2)
    b.lights.add_area_disk(c2, (4, 6, -2), (0, -1, 0.2), (1.5, 0, 0))
    c3 = (7.0, 7.0, 5.0)
    m3 = b.materials.add_diffuse_light(c3)
    g.add_triangle((-1, 7, 2), (1, 7, 2), (0, 7, 4), m3)
    b.lights.add_area_triangle(c3, (-1, 7, 2), (1, 7, 2), (0, 7, 4))

    cam = cam_mod.make_camera((20, 20), 45.0)
    b.camera = cam_mod.looking_at(cam, (0, 4, -12), (0, 1.5, 0), (0, 1, 0))
    return b.build()


@pytest.mark.slow
def test_shaped_lights_match_general_path():
    scene = _shaped_lights_scene()
    assert fsl.scene_supports_single_lobe(scene)
    _compare(scene, pix_n=20, depth=4)


def _plastic_scene():
    """Two-lobe mixtures: plastic (microfacet+lambert) and default uber."""
    b = SceneBuilder()
    g = b.geometry
    g.add_quad((-12, 0, -12), (24, 0, 0), (0, 0, 24),
               b.materials.add_lambertian((0.6, 0.6, 0.55)))
    g.add_sphere((-2, 1, 0), 1.0, b.materials.add_plastic(
        (0.5, 0.15, 0.12), (0.7, 0.7, 0.7), 0.08))
    g.add_sphere((2, 1, 0), 1.0, b.materials.add_uber(
        (0.2, 0.35, 0.55), (0.5, 0.5, 0.5), roughness=0.15))
    light_c = (9.0, 9.0, 9.0)
    light = b.materials.add_diffuse_light(light_c)
    g.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4), light)
    b.lights.add_area_quad(light_c, (-2, 6, -2), (4, 0, 0), (0, 0, 4))
    b.lights.env = presets.BLUE_SKY
    cam = cam_mod.make_camera((20, 20), 45.0)
    b.camera = cam_mod.looking_at(cam, (0, 4, -10), (0, 1, 0), (0, 1, 0))
    return b.build()


def test_plastic_two_lobe_matches_general_path():
    scene = _plastic_scene()
    assert fsl.scene_supports_single_lobe(scene)
    assert fsl.FusedSingleLobeIntegrator(scene, interpret=True).two_slots
    _compare(scene, pix_n=20, depth=4)
    # uber with a reflection lobe (3 lobes) stays on the general path
    b = SceneBuilder()
    m = b.materials.add_uber((0.2, 0.2, 0.2), (0.5, 0.5, 0.5),
                             kr=(0.3, 0.3, 0.3))
    b.geometry.add_sphere((0, 0, 0), 1.0, m)
    b.lights.env = presets.BLUE_SKY
    b.camera = cam_mod.make_camera((8, 8), 45.0)
    assert not fsl.scene_supports_single_lobe(b.build())


def test_cornell_matches_general_and_diffuse_kernel():
    scene = presets.cornell_box()
    cam = cam_mod.looking_at(
        cam_mod.make_camera((20, 20), 40.0), (278, 278, -800), (278, 278, 0),
        (0, 1, 0),
    )
    scene = scene.replace(camera=cam)
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(20 * 20)
    integ = fsl.FusedSingleLobeIntegrator(scene, interpret=True)
    integ_d = fk.FusedDiffuseIntegrator(scene, interpret=True)
    rad_f = np.asarray(integ.render_samples(sampler, pix, 0, max_depth=5,
                                            msaa=2))
    rad_d = np.asarray(integ_d.render_samples(sampler, pix, 0, max_depth=5,
                                              msaa=2))
    rad_j = np.asarray(wavefront.render_samples(scene, sampler, pix, 0,
                                                max_depth=5, msaa=2))
    np.testing.assert_allclose(rad_f, rad_j, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(rad_f, rad_d, atol=2e-5, rtol=1e-4)


def test_env_mapped_matches_general_path():
    scene = _shrunk(presets.env_mapped(), 20)
    _compare(scene, pix_n=20, depth=4, samples=(0,))


def test_sharded_fused_matches_single_device():
    """The fused megakernel composes with the dp x sp mesh: per-shard
    pallas calls + stateless RNG give the identical image."""
    import jax

    from pbrs_tpu import parallel

    scene = _zoo_scene()
    mesh = parallel.make_mesh(n_dp=4, n_sp=2)
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(24 * 24, dtype=jnp.int32)
    integ = fsl.FusedSingleLobeIntegrator(scene, interpret=True)
    shard = jax.jit(lambda sc, p: parallel.render_batch_sharded(
        sc, sampler, p, 0, 2, mesh, max_depth=3, msaa=1, integrator=integ))
    out = np.asarray(shard(scene, pix))
    single = (
        np.asarray(integ.render_samples(sampler, pix, 0, max_depth=3, msaa=1))
        + np.asarray(integ.render_samples(sampler, pix, 1, max_depth=3,
                                          msaa=1))
    )
    np.testing.assert_allclose(out, single, atol=3e-5, rtol=1e-4)


def test_ray_count_matches_general():
    scene = _zoo_scene()
    sampler = smp.PCGSampler(0)
    pix = jnp.arange(24 * 24)
    integ = fsl.FusedSingleLobeIntegrator(scene, interpret=True)
    _, cnt_f = integ.render_samples(sampler, pix, 0, max_depth=4, msaa=2,
                                    return_ray_count=True)
    _, cnt_j = wavefront.render_samples(scene, sampler, pix, 0, max_depth=4,
                                        msaa=2, return_ray_count=True)
    assert float(cnt_f) == pytest.approx(float(cnt_j), rel=1e-6)


def _textured_scene():
    """Checker floor + perlin marble sphere + solid-texture sphere under a
    quad light and gradient env — exercises the in-kernel procedural
    texture overlay (solid/checker/perlin; image textures stay general)."""
    b = SceneBuilder()
    g = b.geometry
    checker = b.textures.add_checker((0.8, 0.2, 0.2), (0.9, 0.9, 0.85))
    perlin = b.textures.add_perlin(2.0)
    solid = b.textures.add_solid((0.2, 0.6, 0.3))
    g.add_quad((-12, 0, -12), (24, 0, 0), (0, 0, 24),
               b.materials.add_matte(tex_id=checker))
    g.add_sphere((-1.5, 1, 0), 1.0, b.materials.add_matte(tex_id=perlin))
    g.add_sphere((1.5, 1, 0), 1.0, b.materials.add_matte(tex_id=solid))
    light_c = (6.0, 6.0, 6.0)
    light = b.materials.add_diffuse_light(light_c)
    g.add_quad((-2, 7, -2), (4, 0, 0), (0, 0, 4), light)
    b.lights.add_area_quad(light_c, (-2, 7, -2), (4, 0, 0), (0, 0, 4))
    b.lights.env = presets.BLUE_SKY
    cam = cam_mod.make_camera((20, 20), 45.0)
    b.camera = cam_mod.looking_at(cam, (0, 3, -10), (0, 1, 0), (0, 1, 0))
    return b.build()


@pytest.mark.slow
def test_textured_matches_general_path():
    scene = _textured_scene()
    assert fsl.scene_supports_single_lobe(scene)
    assert not fk.scene_supports_fused(scene)
    _compare(scene, pix_n=20)


def test_image_texture_stays_general():
    b = SceneBuilder()
    g = b.geometry
    img = b.textures.add_image(np.full((4, 4, 3), 0.5, np.float32))
    g.add_quad((-5, 0, -5), (10, 0, 0), (0, 0, 10),
               b.materials.add_matte(tex_id=img))
    c = (5.0, 5.0, 5.0)
    m = b.materials.add_diffuse_light(c)
    g.add_quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), m)
    b.lights.add_area_quad(c, (-1, 4, -1), (2, 0, 0), (0, 0, 2))
    cam = cam_mod.make_camera((8, 8), 45.0)
    b.camera = cam_mod.looking_at(cam, (0, 2, -6), (0, 0.5, 0), (0, 1, 0))
    scene = b.build()
    assert not fsl.scene_supports_single_lobe(scene)


def test_zoo_sobol_matches_general_path():
    """rng='sobol' threading through the single-lobe kernel (VERDICT r4 #9)."""
    _compare(_zoo_scene(), pix_n=16, depth=3, samples=(0,),
             sampler=smp.SobolSampler(3))
