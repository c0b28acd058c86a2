"""Statistical quality checks for the counter-based samplers."""

import numpy as np
import jax.numpy as jnp

from pbrs_tpu.core import sampler as smp


def test_pcg_uniform_range_and_mean():
    s = smp.PCGSampler(seed=7)
    pix = jnp.arange(1 << 16)
    u = np.asarray(s.u1(pix, 3, 2, smp.DIM_SCATTER_UV))
    assert u.min() >= 0.0 and u.max() < 1.0
    np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, atol=5e-3)


def test_pcg_streams_decorrelated():
    s = smp.PCGSampler(seed=7)
    pix = jnp.arange(1 << 14)
    a = np.asarray(s.u1(pix, 0, 0, 3))
    b = np.asarray(s.u1(pix, 0, 1, 3))  # next bounce
    c = np.asarray(s.u1(pix, 1, 0, 3))  # next sample
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.03
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.03


def test_pcg_deterministic():
    s1 = smp.PCGSampler(seed=1)
    s2 = smp.PCGSampler(seed=1)
    pix = jnp.arange(128)
    np.testing.assert_array_equal(
        np.asarray(s1.u2(pix, 5, 2, 4)), np.asarray(s2.u2(pix, 5, 2, 4))
    )
    s3 = smp.PCGSampler(seed=2)
    assert not np.array_equal(
        np.asarray(s1.u1(pix, 5, 2, 4)), np.asarray(s3.u1(pix, 5, 2, 4))
    )


def test_pcg_2d_stratification_coverage():
    # u2 draws should fill the unit square reasonably: chi-square on a 8x8
    # grid over 64k samples.
    s = smp.PCGSampler(seed=3)
    pix = jnp.arange(1 << 16)
    uv = np.asarray(s.u2(pix, 0, 0, smp.DIM_LIGHT_UV))
    cells = (uv[:, 0] * 8).astype(int) * 8 + (uv[:, 1] * 8).astype(int)
    counts = np.bincount(cells, minlength=64)
    expected = len(uv) / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # 63 dof; mean 63, std ~11. Allow generous headroom.
    assert chi2 < 150, chi2


def test_stratified_jitter_strata():
    s = smp.PCGSampler(seed=0)
    pix = jnp.zeros(1, jnp.int32)
    msaa = 4
    for i in range(msaa * msaa):
        dx, dy = smp.stratified_jitter(s, pix, i, msaa)
        sx, sy = i // msaa, i % msaa
        assert sx / msaa <= float(dx[0]) < (sx + 1) / msaa
        assert sy / msaa <= float(dy[0]) < (sy + 1) / msaa


def test_threefry_agrees_statistically():
    s = smp.ThreefrySampler(seed=0)
    pix = jnp.arange(1 << 12)
    u = np.asarray(s.u1(pix, 0, 0, 0))
    np.testing.assert_allclose(u.mean(), 0.5, atol=2e-2)
