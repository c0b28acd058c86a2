"""Treelet MXU-gather tracer vs brute force.

The treelet tracer (accel/treelet.py) replaces per-ray BVH pointer chasing
[ref: shape/src/blas.rs:422-476] with key-sorted treelet rounds whose gather
runs through the MXU. These tests pin closest-hit/any-hit agreement with a
numpy brute force over every primitive family, including t_max truncation
and the chunked-compaction path (t_pad > CHUNK).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrs_tpu.accel import treelet
from pbrs_tpu.geometry import ray as ray_mod

T_MIN = treelet.T_MIN


def _rays(rng, n, center, spread=6.0, tmax_frac=0.3):
    o = (center + rng.standard_normal((n, 3)) * spread).astype(np.float32)
    d = (center - o) + rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    tmax = np.full(n, 1e30, np.float32)
    k = int(n * tmax_frac)
    tmax[:k] = rng.uniform(5.0, 12.0, k).astype(np.float32)
    return ray_mod.RayBatch(jnp.asarray(o), jnp.asarray(d),
                            jnp.asarray(tmax)), o, d, tmax


def _check(tracer, o, d, tmax, t_bf, i_bf, rtol=1e-4):
    rays = ray_mod.RayBatch(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax))
    t, idx = tracer.trace(rays)
    t = np.asarray(t)
    idx = np.asarray(idx)
    fin = np.isfinite(t)
    fr = np.isfinite(t_bf)
    np.testing.assert_array_equal(fin, fr)
    both = fin & fr
    if both.any():
        np.testing.assert_allclose(t[both], t_bf[both], rtol=rtol, atol=1e-5)
        assert (idx[both] == i_bf[both]).mean() > 0.995
    # any-hit: hit mask must agree (t value is whichever hit found first)
    ta, _ = tracer.trace(rays, any_hit=True)
    np.testing.assert_array_equal(np.isfinite(np.asarray(ta)), fr)


def _tri_bf(p0, p1, p2, o, d, tmax, base):
    n = np.cross(p0 - p1, p2 - p1)
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    N = len(o)
    T = np.full(N, np.inf)
    I = np.full(N, -1)
    for i in range(N):
        den = (d[i] * n).sum(1)
        dens = np.where(den == 0, 1, den)
        t = ((p0 - o[i]) * n).sum(1) / dens
        h = o[i] + t[:, None] * d[i]
        b2 = (np.cross(h - p0, h - p1) * n).sum(1)
        b0 = (np.cross(h - p1, h - p2) * n).sum(1)
        b1 = (np.cross(h - p2, h - p0) * n).sum(1)
        inside = ((b0 > 0) & (b1 > 0) & (b2 > 0)) | (
            (b0 < 0) & (b1 < 0) & (b2 < 0))
        ok = (den != 0) & inside & (t >= T_MIN) & (t < tmax[i])
        if ok.any():
            j = np.argmin(np.where(ok, t, np.inf))
            T[i] = t[j]
            I[i] = j + base
    return T, I


def _mesh(levels):
    from pbrs_tpu.scene import subdivision

    pos = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                    [0, 0, 1], [0, 0, -1]], np.float32)
    idx = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                    [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    pos, idx = subdivision.loop_subdivide(pos, idx, levels)
    pos = pos / np.linalg.norm(pos, axis=1, keepdims=True) * 2.0
    return pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]


@pytest.mark.parametrize("levels", [3, 5])
def test_treelet_tri_matches_brute_force(levels):
    # levels=3 exercises the single-chunk path, levels=5 the chunked one.
    p0, p1, p2 = _mesh(levels)
    tr = treelet.tri_tracer(p0, p1, p2, 17, interpret=True)
    if levels == 5:
        assert tr.t_pad > treelet.CHUNK  # chunked-compaction path
    rng = np.random.default_rng(levels)
    _, o, d, tmax = _rays(rng, 512, p0.mean(0))
    t_bf, i_bf = _tri_bf(p0, p1, p2, o, d, tmax, 17)
    assert np.isfinite(t_bf).any() and not np.isfinite(t_bf).all()
    _check(tr, o, d, tmax, t_bf, i_bf)


def test_treelet_spheres_match_brute_force():
    rng = np.random.default_rng(3)
    P = 700
    c = rng.uniform(-6, 6, (P, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.6, P).astype(np.float32)
    tr = treelet.sphere_tracer(c, r, 0, interpret=True)
    _, o, d, tmax = _rays(rng, 384, np.zeros(3), spread=9.0)
    N = len(o)
    T = np.full(N, np.inf)
    I = np.full(N, -1)
    for i in range(N):
        f = o[i] - c
        b = (f * d[i]).sum(1)
        cc = (f * f).sum(1) - r * r
        disc = b * b - cc
        ok0 = disc >= 0
        sq = np.sqrt(np.maximum(disc, 0))
        t0 = -b - sq
        t1 = -b + sq
        t = np.where((t0 >= T_MIN) & (t0 < tmax[i]), t0, t1)
        ok = ok0 & (t >= T_MIN) & (t < tmax[i])
        if ok.any():
            j = np.argmin(np.where(ok, t, np.inf))
            T[i] = t[j]
            I[i] = j
    _check(tr, o, d, tmax, T, I, rtol=5e-4)


def test_treelet_quads_match_brute_force():
    rng = np.random.default_rng(5)
    P = 300
    qo = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    qu = rng.standard_normal((P, 3)).astype(np.float32) * 0.8
    qv = rng.standard_normal((P, 3)).astype(np.float32) * 0.8
    tr = treelet.quad_tracer(qo, qu, qv, 11, interpret=True)
    _, o, d, tmax = _rays(rng, 384, np.zeros(3), spread=8.0)
    N = len(o)
    T = np.full(N, np.inf)
    I = np.full(N, -1)
    n = np.cross(qu, qv)
    n2 = np.maximum((n * n).sum(1), 1e-30)
    for i in range(N):
        den = (d[i] * n).sum(1)
        dens = np.where(den == 0, 1, den)
        t = ((qo - o[i]) * n).sum(1) / dens
        h = o[i] + t[:, None] * d[i] - qo
        uu = (np.cross(h, qv) * n).sum(1) / n2
        vv = (np.cross(qu, h) * n).sum(1) / n2
        ok = ((den != 0) & (uu >= 0) & (uu <= 1) & (vv >= 0) & (vv <= 1)
              & (t >= T_MIN) & (t < tmax[i]))
        if ok.any():
            j = np.argmin(np.where(ok, t, np.inf))
            T[i] = t[j]
            I[i] = j + 11
    _check(tr, o, d, tmax, T, I)
