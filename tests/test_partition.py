"""Big/small primitive partition (trace_pallas.PallasTracer): the flat
bank's id column + the treelet tracer's id map must reproduce exactly the
unpartitioned winner set on a mixed-scale scene (a dense mesh inside a
room shell of huge triangles — the interior-scene shape)."""

import numpy as np
import jax.numpy as jnp

from pbrs_tpu.accel import trace_pallas as tp
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.shapes import intersect as isect_mod
from pbrs_tpu.shapes import tables as tb


def _mixed_scene(n_mesh=1500, seed=0):
    rng = np.random.default_rng(seed)
    b = tb.GeometryBuilder()
    # Room shell: 10 huge triangles (~6 units) around the origin.
    s = 3.0
    room = [
        ((-s, 0, -s), (s, 0, -s), (s, 0, s)),
        ((-s, 0, -s), (s, 0, s), (-s, 0, s)),
        ((-s, 3, -s), (s, 3, s), (s, 3, -s)),
        ((-s, 3, -s), (-s, 3, s), (s, 3, s)),
        ((-s, 0, -s), (s, 3, -s), (s, 0, -s)),
        ((-s, 0, -s), (-s, 3, -s), (s, 3, -s)),
        ((-s, 0, s), (s, 0, s), (s, 3, s)),
        ((-s, 0, s), (s, 3, s), (-s, 3, s)),
        ((-s, 0, -s), (-s, 0, s), (-s, 3, s)),
        ((s, 0, -s), (s, 3, s), (s, 0, s)),
    ]
    for p0, p1, p2 in room:
        b.add_triangle(p0, p1, p2, 0)
    # Dense tiny-triangle cluster near the center (the "mesh").
    c = rng.uniform(-0.4, 0.4, (n_mesh, 3)) + np.array([0, 1.2, 0])
    e1 = rng.uniform(-0.03, 0.03, (n_mesh, 3))
    e2 = rng.uniform(-0.03, 0.03, (n_mesh, 3))
    for i in range(n_mesh):
        b.add_triangle(c[i], c[i] + e1[i], c[i] + e2[i], 1)
    # One sphere + one quad so other families exercise the id column too.
    b.add_sphere((1.5, 0.5, 0), 0.5, 0)
    b.add_quad((-2, 0.01, -2), (1, 0, 0), (0, 0, 1), 0)
    return b.build()


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.1, 2.9, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return ray_mod.RayBatch(origin=jnp.asarray(o), dir=jnp.asarray(d),
                            t_max=jnp.full(n, 3e38, jnp.float32))


def test_partitioned_tracer_matches_brute_force():
    geom = _mixed_scene()
    tr = tp.PallasTracer(geom, interpret=True, bvh_threshold=256)
    # The partition must actually trigger: a tri subset in the bank and a
    # treelet tracer for the remainder.
    assert tr.do_types[2] is True and tr.counts[2] > 0
    assert tr.counts[2] <= tp.PARTITION_MAX_FLAT
    assert tr.mesh is not None

    rays = _rays(1024)
    t_p, i_p = tr.trace(rays)
    ref = isect_mod.intersect(geom, rays)
    # Brute force reports hit+t+prim detail; compare via hit mask and t.
    hit_p = np.isfinite(np.asarray(t_p))
    np.testing.assert_array_equal(hit_p, np.asarray(ref.hit))
    tp_np = np.where(hit_p, np.asarray(t_p), 0.0)
    tr_np = np.where(np.asarray(ref.hit), np.asarray(ref.t), 0.0)
    np.testing.assert_allclose(tp_np, tr_np, rtol=2e-5, atol=2e-5)

    # Winner ids must match an UNpartitioned tracer bit-for-bit (global
    # id preservation through bank column + treelet id map).
    tr_all = tp.PallasTracer(geom, interpret=True, bvh_threshold=10**6)
    t_a, i_a = tr_all.trace(rays)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_a))

    # Any-hit agreement.
    occ_p = np.asarray(tr.occluded(rays))
    occ_a = np.asarray(tr_all.occluded(rays))
    np.testing.assert_array_equal(occ_p, occ_a)


def test_partition_heuristic_bounds():
    area = np.concatenate([np.full(2000, 1e-4), np.full(10, 5.0)])
    big, small = tp._partition_big(area, 1024)
    assert big is not None and len(big) == 10 and len(small) == 2000
    # Uniform family: no partition.
    big, small = tp._partition_big(np.full(5000, 1e-3), 1024)
    assert big is None
    # More big prims than the flat bank holds: keep the LARGEST
    # PARTITION_MAX_FLAT (aborting would dump the room-shell walls into
    # the treelet walk — the interior regression the cap fixes).
    area = np.concatenate([np.full(2000, 1e-4), np.full(500, 5.0),
                           np.full(3, 100.0)])
    big, small = tp._partition_big(area, 1024)
    assert big is not None and len(big) == tp.PARTITION_MAX_FLAT
    assert len(small) == area.shape[0] - tp.PARTITION_MAX_FLAT
    assert set(range(2500, 2503)) <= set(big)  # the largest stay flat
