"""Pallas trace kernels vs the jnp sweep (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrs_tpu.accel import trace_pallas as tp
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.scene import presets
from pbrs_tpu.shapes import intersect as im


@pytest.fixture(scope="module")
def cornell_geom():
    return presets.cornell_box().geom


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.asarray([278, 278, -800], np.float32) + rng.normal(
        size=(n, 3)
    ).astype(np.float32) * 50
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return ray_mod.make_rays(jnp.asarray(o), jnp.asarray(d))


def test_pallas_trace_matches_jnp(cornell_geom):
    rays = _random_rays(1024)
    tracer = tp.PallasTracer(cornell_geom, interpret=True)
    t_p, idx_p = tracer.trace(rays)
    hit_j = im.intersect(cornell_geom, rays)
    t_p = np.asarray(t_p)
    t_j = np.asarray(hit_j.t)
    both_inf = np.isinf(t_p) & np.isinf(t_j)
    close = np.isclose(t_p, t_j, rtol=1e-4, atol=1e-4)
    assert np.mean(both_inf | close) > 0.999


def test_pallas_occlusion_matches_jnp(cornell_geom):
    rays = _random_rays(1024, seed=3)
    # Bounded shadow-style rays too.
    rays = rays.replace(
        t_max=jnp.where(jnp.arange(1024) % 2 == 0, 200.0, jnp.inf)
    )
    tracer = tp.PallasTracer(cornell_geom, interpret=True)
    occ_p = np.asarray(tracer.occluded(rays))
    occ_j = np.asarray(im.occluded(cornell_geom, rays))
    assert np.mean(occ_p == occ_j) > 0.999


def test_pallas_detail_roundtrip(cornell_geom):
    rays = _random_rays(512, seed=5)
    tracer = tp.PallasTracer(cornell_geom, interpret=True)
    t, idx = tracer.trace(rays)
    hit_p = im.hit_from_t_idx(cornell_geom, rays, t, idx)
    hit_j = im.intersect(cornell_geom, rays)
    m = np.asarray(hit_p.hit) & np.asarray(hit_j.hit)
    np.testing.assert_allclose(
        np.asarray(hit_p.pos)[m], np.asarray(hit_j.pos)[m], rtol=1e-3,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(hit_p.normal)[m], np.asarray(hit_j.normal)[m], atol=1e-4
    )
    assert np.array_equal(np.asarray(hit_p.mat_id)[m], np.asarray(hit_j.mat_id)[m])
