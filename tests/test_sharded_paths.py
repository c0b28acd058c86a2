"""Round-3 fast paths under shard_map (8-device CPU mesh).

The compacting loop's film banking (`wavefront.bank()` block scatters)
and the row-dense treelet kernel's row gathers are exactly the kind of
code that silently breaks under sharding; neither had multi-device
coverage before. Both tests pin sharded execution against the
already-verified single-device semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pbrs_tpu import parallel
from pbrs_tpu.accel import bvh as bvh_mod
from pbrs_tpu.accel import treelet as tl
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets

N_DEV = 8


def _small_scene(w=64, h=48):
    from pbrs_tpu.geometry import camera as cam_mod

    scene = presets.mesh_ball(levels=2)
    cam = scene.camera
    fresh = cam_mod.make_camera((w, h), 35.0)
    return scene.replace(camera=fresh.replace(
        center=cam.center, orientation=cam.orientation, c=cam.c,
        a=cam.a * (cam.width // 2) / (w // 2),
        b=cam.b * (cam.height // 2) / (h // 2),
    ))


def test_sharded_compacted_matches_sharded_masked():
    """path_radiance_compacted under shard_map == the masked loop under
    the same sharding. Each dp shard runs its own shrink schedule; the
    banking scatters must stay shard-local."""
    scene = _small_scene()
    sampler = smp.PCGSampler(7)
    n = 64 * 48
    depth = 5
    mesh = parallel.make_mesh(n_dp=N_DEV, n_sp=1)
    pix = jnp.arange(n, dtype=jnp.int32)
    n_shard = n // N_DEV

    # Worst-shard alive counts -> one static schedule valid (p == 1) on
    # every shard, so sharded-compacted must equal sharded-masked.
    counts = []
    for d in range(N_DEV):
        p = pix[d * n_shard:(d + 1) * n_shard]
        counts.append(np.asarray(jax.jit(lambda p=p: wavefront.measure_alive(
            scene, sampler, p, jnp.zeros(n_shard, jnp.int32),
            max_depth=depth, msaa=2))()))
    sched = wavefront.auto_schedule(
        np.max(np.stack(counts), axis=0), n_shard, min_cap=64)
    assert sched[0] == n_shard
    assert any(c < n_shard for c in sched[1:]), (sched,)

    def shard_fn(p, schedule):
        return wavefront.render_samples(
            scene, sampler, p, jnp.zeros(p.shape[0], jnp.int32),
            max_depth=depth, msaa=2, shrink_schedule=schedule)

    def run(schedule):
        fn = jax.shard_map(
            lambda p: shard_fn(p, schedule), mesh=mesh,
            in_specs=P(("dp", "sp")), out_specs=P(("dp", "sp")),
            check_vma=False)
        return np.asarray(jax.jit(fn)(pix))

    masked = run(None)
    compacted = run(sched)
    assert np.isfinite(compacted).all()
    np.testing.assert_allclose(masked, compacted, atol=1e-5, rtol=1e-4)


def test_sharded_rowdense_matches_single_device_onehot():
    """trace(mode='rowdense') under shard_map == single-device one-hot
    trace: per-shard row gathers and the shared-column one-hot must not
    depend on the global lane layout."""
    rng = np.random.default_rng(0)
    n_tri = 300
    p0 = rng.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    p1 = p0 + rng.uniform(-0.2, 0.2, (n_tri, 3)).astype(np.float32)
    p2 = p0 + rng.uniform(-0.2, 0.2, (n_tri, 3)).astype(np.float32)
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), lo, hi,
                          0, interpret=True)
    assert tr.rowdense_ok

    n_rays = 2048
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = ray_mod.RayBatch(
        origin=jnp.asarray(o), dir=jnp.asarray(d),
        t_max=jnp.full(n_rays, 3e38, jnp.float32))

    t_ref, i_ref = tr.trace(rays)  # single-device one-hot

    mesh = parallel.make_mesh(n_dp=N_DEV, n_sp=1)
    fn = jax.shard_map(
        lambda r: tr.trace(r, mode="rowdense"), mesh=mesh,
        in_specs=P(("dp", "sp")), out_specs=P(("dp", "sp")),
        check_vma=False)
    t_sh, i_sh = jax.jit(fn)(rays)

    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(t_ref)), np.asarray(t_ref), -1.0),
        np.where(np.isfinite(np.asarray(t_sh)), np.asarray(t_sh), -1.0),
        rtol=1e-6, atol=1e-6)
