"""Pixel reconstruction filters.

[ref: math/src/filter.rs:21-90] — with the Gaussian bug fixed (the
reference's first term is missing `.exp()`, filter.rs:40-41).

The reference parses filters from scene files but never applies them
(film accumulation is a box average, reference src/main.rs:208). Here
filters are applied by *filter importance sampling*: the per-sample pixel
jitter is drawn from the normalized filter distribution instead of
uniformly, which applies any non-negative filter with constant weight 1 —
no splatting, no per-sample weights, ideal for a fixed-shape wavefront.
Sampling uses an inverse-CDF table (host-precomputed, device lookup).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

BOX = 0
TRIANGLE = 1
GAUSSIAN = 2
MITCHELL = 3
LANCZOS = 4

_CDF_RES = 1024


def eval_filter_1d(kind: int, radius: float, x, alpha=2.0, b=1.0 / 3.0,
                   c=1.0 / 3.0, tau=3.0):
    """1-D filter profile (filters below are separable products).
    Host-side NumPy. [ref: math/src/filter.rs:21-90]"""
    x = np.asarray(x, np.float64)
    ax = np.abs(x)
    if kind == BOX:
        return (ax <= radius).astype(np.float64)
    if kind == TRIANGLE:
        return np.maximum(radius - ax, 0.0)
    if kind == GAUSSIAN:
        # exp(-a x²) - exp(-a r²), clamped at 0 (reference filter.rs:38-45,
        # with the missing .exp() restored).
        return np.maximum(
            np.exp(-alpha * x * x) - np.exp(-alpha * radius * radius), 0.0
        )
    if kind == MITCHELL:
        t = np.clip(ax / radius, 0, 1) * 2.0  # [ref: filter.rs:47-55]
        f1 = (
            (12.0 - 9.0 * b - 6.0 * c) * t**3
            + (-18.0 + 12.0 * b + 6.0 * c) * t**2
            + (6.0 - 2.0 * b)
        )
        f2 = (
            (-b - 6.0 * c) * t**3 + (6.0 * b + 30.0 * c) * t**2
            + (-12.0 * b - 48.0 * c) * t + (8.0 * b + 24.0 * c)
        )
        val = np.where(t > 1.0, f2, f1) * (1.0 / 6.0)
        return np.where(ax <= radius, val, 0.0)
    if kind == LANCZOS:
        # windowed sinc [ref: filter.rs:57-75]
        def sinc(v):
            v = np.abs(v)
            return np.where(v < 1e-5, 1.0, np.sin(np.pi * v) / (np.pi * v))
        lanczos = sinc(x / radius * tau)  # window
        return np.where(ax <= radius, sinc(x) * lanczos, 0.0)
    raise ValueError(f"unknown filter kind {kind}")


class FilterTable:
    """Inverse-CDF table + per-bin signed weights for weighted FIS.

    `weighted` is a host-side flag: False for non-negative filters
    (box/triangle/gaussian), where every weight is exactly 1 and the film
    can skip the weight multiply entirely.
    """

    def __init__(self, inv_cdf, weights, weighted: bool):
        self.inv_cdf = inv_cdf
        self.weights = weights
        self.weighted = weighted


def make_filter_cdf(kind: int, radius: float, **params) -> FilterTable:
    """Weighted filter-importance-sampling table.

    Samples are drawn from |f| / ∫|f|; each sample carries the signed weight
    w(x) = sign(f(x)) · ∫|f| / ∫f, so E[w·L] = ∫ f L / ∫ f — the true filter,
    including Mitchell/Lanczos negative lobes (the reference evaluates the
    true Mitchell-Netravali kernel, math/src/filter.rs:47-75, but never
    applies it; we apply it exactly up to the table resolution).
    """
    xs = np.linspace(-radius, radius, 4096)
    f = eval_filter_1d(kind, radius, xs, **params)
    af = np.abs(f)
    int_f = np.trapezoid(f, xs)
    int_af = np.trapezoid(af, xs)
    ratio = float(int_af / int_f)
    cdf = np.cumsum(af)
    cdf = cdf / cdf[-1]
    u = np.linspace(0.0, 1.0, _CDF_RES + 1)
    inv = np.interp(u, cdf, xs)
    # Per-bin signed weight from the filter sign at the bin midpoint.
    mid = 0.5 * (inv[:-1] + inv[1:])
    sgn = np.sign(eval_filter_1d(kind, radius, mid, **params))
    sgn = np.where(sgn == 0.0, 1.0, sgn)
    wgt = np.concatenate([sgn * ratio, [sgn[-1] * ratio]])
    weighted = bool(np.any(wgt != 1.0))
    return FilterTable(
        jnp.asarray(inv.astype(np.float32)),
        jnp.asarray(wgt.astype(np.float32)),
        weighted,
    )


def sample_filter_offset(table: FilterTable, u):
    """Map uniform u [N] -> (filter-distributed offset, signed FIS weight)."""
    pos = u * _CDF_RES
    i0 = jnp.clip(pos.astype(jnp.int32), 0, _CDF_RES - 1)
    frac = pos - i0.astype(jnp.float32)
    a = table.inv_cdf[i0]
    b = table.inv_cdf[i0 + 1]
    off = a + frac * (b - a)
    if not table.weighted:
        return off, None
    return off, table.weights[i0]
