"""Row-dense treelet mode: exact agreement with the per-lane one-hot
kernels (closest-hit t and prim id, any-hit blocked set), single- and
multi-chunk, plus the Morton pixel-order helper's permutation property.

The two kernels implement the same accept sets over the same f32 fields
(the bf16 3-split gather reconstructs exactly in both), so agreement is
required bit-for-bit, not statistically.
"""

import numpy as np
import jax.numpy as jnp

from pbrs_tpu.accel import bvh as bvh_mod
from pbrs_tpu.accel import treelet as tl
from pbrs_tpu.geometry import ray as ray_mod


def _random_tris(n, spread, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32) * spread
    p1 = p0 + rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    p2 = p0 + rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    return p0, p1, p2


def _random_rays(n, lo, hi, seed=1, t_max=3e38):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return ray_mod.RayBatch(origin=jnp.asarray(o), dir=jnp.asarray(d),
                            t_max=jnp.full(n, t_max, jnp.float32))


def _check_agreement(tr, rays):
    t1, i1 = tr.trace(rays)
    modes = (["rowdense"] + (["rowdyn"] if tr.rowdyn_ok else [])
             + (["rowdynh"] if tr.rowdynh_ok else []))
    for mode in modes:
        t2, i2 = tr.trace(rays, mode=mode)
        t1n, i1n, t2n, i2n = map(np.asarray, (t1, i1, t2, i2))
        np.testing.assert_array_equal(i1n, i2n, err_msg=mode)
        np.testing.assert_allclose(
            np.where(np.isfinite(t1n), t1n, -1.0),
            np.where(np.isfinite(t2n), t2n, -1.0), rtol=1e-6, atol=1e-6,
            err_msg=mode)
        t1a, _ = tr.trace(rays, any_hit=True)
        t2a, _ = tr.trace(rays, any_hit=True, mode=mode)
        np.testing.assert_array_equal(
            np.isfinite(np.asarray(t1a)), np.isfinite(np.asarray(t2a)),
            err_msg=mode)


def test_rowdense_matches_onehot_single_chunk():
    p0, p1, p2 = _random_tris(300, np.float32([1, 1, 1]))
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), lo, hi,
                          0, interpret=True)
    assert tr.rowdense_ok and tr.n_chunks == 1
    _check_agreement(tr, _random_rays(2048, -3, 3))


def test_rowdense_matches_onehot_multi_chunk():
    # Small treelets force > CHUNK treelets -> the chunk-gated key init.
    p0, p1, p2 = _random_tris(2500, np.float32([50, 1, 1]))
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), lo, hi,
                          0, interpret=True, treelet=8)
    assert tr.rowdense_ok and tr.n_chunks > 1
    _check_agreement(tr, _random_rays(2048, -60, 60))


def test_rowdense_dead_and_bounded_lanes():
    p0, p1, p2 = _random_tris(300, np.float32([1, 1, 1]))
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), lo, hi,
                          0, interpret=True)
    rays = _random_rays(1024, -3, 3, seed=5)
    # Mix of dead lanes (t_max<=0) and tight t_max bounds.
    rng = np.random.default_rng(9)
    t_max = np.where(rng.uniform(size=1024) < 0.3, 0.0,
                     rng.uniform(0.5, 6.0, 1024)).astype(np.float32)
    rays = rays.replace(t_max=jnp.asarray(t_max))
    _check_agreement(tr, rays)


def test_rowdense_sphere_family():
    rng = np.random.default_rng(3)
    c = rng.uniform(-2, 2, (400, 3)).astype(np.float32)
    r = rng.uniform(0.05, 0.3, 400).astype(np.float32)
    lo, hi = c - r[:, None], c + r[:, None]
    tr = tl.TreeletTracer(tl.KIND_SPHERE, tl._sphere_fields(c, r), lo, hi,
                          0, interpret=True)
    assert tr.rowdense_ok
    _check_agreement(tr, _random_rays(2048, -4, 4, seed=11))


def test_morton_pixel_order_is_permutation():
    from pbrs_tpu.integrators import wavefront

    for w, h in ((7, 5), (800, 600), (64, 64)):
        order = wavefront.morton_pixel_order(w, h)
        assert order.shape == (w * h,)
        assert np.array_equal(np.sort(order), np.arange(w * h))
    # Z-curve locality: the first 4 pixels of a pow2 image form a 2x2 tile.
    o = wavefront.morton_pixel_order(64, 64)[:4]
    xs, ys = o % 64, o // 64
    assert xs.max() - xs.min() == 1 and ys.max() - ys.min() == 1


def test_rowdense_infinite_tmax_and_other_kinds():
    """Round-4 regression: with t_max = +inf (camera rays) the row-dense
    kernel's initial bound must clamp to the BIG sentinel, else an
    all-miss round records a phantom hit at t == BIG (observed on TPU as
    whole rows of bogus ids -> NaN normals). Also covers quad and sphere
    treelet kinds, which the original tests (t_max = 3e38 == BIG,
    triangles only) never exercised."""
    rng = np.random.default_rng(3)
    n_rays = 2048
    o = rng.uniform(-6, 6, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_inf = ray_mod.RayBatch(
        origin=jnp.asarray(o), dir=jnp.asarray(d),
        t_max=jnp.full(n_rays, np.inf, jnp.float32))

    # Quads: a loose grid most rays miss.
    qo = rng.uniform(-4, 4, (300, 3)).astype(np.float32)
    qu = rng.uniform(-0.3, 0.3, (300, 3)).astype(np.float32)
    qv = rng.uniform(-0.3, 0.3, (300, 3)).astype(np.float32)
    corners = np.stack([qo, qo + qu, qo + qv, qo + qu + qv])
    trq = tl.TreeletTracer(tl.KIND_QUAD, tl._quad_fields(qo, qu, qv),
                           corners.min(0), corners.max(0), 0,
                           interpret=True)
    # Spheres.
    sc = rng.uniform(-4, 4, (300, 3)).astype(np.float32)
    sr = rng.uniform(0.05, 0.3, 300).astype(np.float32)
    trs = tl.TreeletTracer(tl.KIND_SPHERE, tl._sphere_fields(sc, sr),
                           sc - sr[:, None], sc + sr[:, None], 0,
                           interpret=True)
    for tr in (trq, trs):
        assert tr.rowdense_ok
        _check_agreement(tr, rays_inf)
        t2, _ = tr.trace(rays_inf, mode="rowdense")
        # No phantom hits at the sentinel.
        t2 = np.asarray(t2)
        assert not np.any((t2 >= 2.9e38) & np.isfinite(t2))


def test_rowdyn_ladder_falls_back_to_hbm_fetch():
    """When the VMEM gates reject both the rowdyn split table and the
    rowdense flat table, mode='rowdyn' must route to the HBM-resident
    per-round DMA fetch ('dynhbm') and agree with the one-hot kernels
    exactly (the fetch reads the identical bf16 3-split fields)."""
    p0, p1, p2 = _random_tris(900, np.float32([2, 2, 2]), seed=7)
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), lo, hi,
                          0, interpret=True)
    assert tr.rowdynh_ok
    # Simulate a beyond-VMEM mesh: both VMEM layouts rejected.
    tr.rowdyn_ok = False
    tr.rowdense_ok = False
    rays = _random_rays(2048, -4, 4, seed=8)
    t1, i1 = tr.trace(rays)
    t2, i2 = tr.trace(rays, mode="rowdyn")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(t1)), np.asarray(t1), -1.0),
        np.where(np.isfinite(np.asarray(t2)), np.asarray(t2), -1.0),
        rtol=1e-6, atol=1e-6)
