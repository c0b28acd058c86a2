"""Microfacet normal distributions (Beckmann, Trowbridge-Reitz).

Vectorized over [..., ] angle arrays in the local shading frame (+z normal).
Replaces reference geometry/src/microfacet.rs. Unlike the reference, the
Trowbridge-Reitz `sample_wh` is implemented (the reference leaves it
`todo!()`, microfacet.rs:156).

Directions are unit [..., 3] arrays; trig identities follow the Omega
accessors (reference geometry/src/bxdf.rs:42-107).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm

BECKMANN = 0
TROWBRIDGE_REITZ = 1

_PI = jnp.pi


def roughness_to_alpha(roughness):
    """PBRT-style remap. [ref: geometry/src/microfacet.rs:16-23]"""
    x = jnp.maximum(jnp.log(jnp.maximum(roughness, 1e-30)), -8.0)
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x**2
        + 0.0171201 * x**3
        + 0.000640711 * x**4
    )


# Local-frame trig helpers (w is unit, normal = +z).
def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] ** 2


def sin2_theta(w):
    return jnp.maximum(1.0 - cos2_theta(w), 0.0)


def tan2_theta(w):
    c2 = cos2_theta(w)
    return sin2_theta(w) / jnp.maximum(c2, 1e-30)


def cos2_phi(w):
    xy2 = w[..., 0] ** 2 + w[..., 1] ** 2
    return jnp.where(xy2 > 0.0, w[..., 0] ** 2 / jnp.maximum(xy2, 1e-30), 1.0)


def sin2_phi(w):
    xy2 = w[..., 0] ** 2 + w[..., 1] ** 2
    return jnp.where(xy2 > 0.0, w[..., 1] ** 2 / jnp.maximum(xy2, 1e-30), 0.0)


def same_hemisphere(w0, w1):
    return cos_theta(w0) * cos_theta(w1) >= 0.0


def d(distrib, alpha_x, alpha_y, wh):
    """Differential area of microfacets with normal wh; satisfies
    ∫ D(wh) cosθh dωh = 1. [ref: geometry/src/microfacet.rs:36-60]"""
    t2 = tan2_theta(wh)
    c4 = cos2_theta(wh) ** 2
    e = cos2_phi(wh) / alpha_x**2 + sin2_phi(wh) / alpha_y**2
    denom = jnp.maximum(_PI * alpha_x * alpha_y * c4, 1e-30)
    d_beck = jnp.exp(-e * t2) / denom
    d_tr = 1.0 / jnp.maximum((1.0 + e * t2) ** 2 * denom, 1e-30)
    val = jnp.where(distrib == BECKMANN, d_beck, d_tr)
    grazing = ~jnp.isfinite(t2) | (c4 < 1e-32)
    return jnp.where(grazing, 0.0, val)


def _lambda(distrib, alpha_x, alpha_y, w):
    """Masked-area ratio Λ(w). [ref: geometry/src/microfacet.rs:65-88]"""
    abs_tan = jnp.sqrt(jnp.maximum(tan2_theta(w), 0.0))
    alpha2 = cos2_phi(w) * alpha_x**2 + sin2_phi(w) * alpha_y**2
    # Beckmann rational fit
    a = 1.0 / jnp.maximum(jnp.sqrt(alpha2) * abs_tan, 1e-30)
    lam_beck = jnp.where(
        a >= 1.6,
        0.0,
        (1.0 - 1.259 * a + 0.396 * a**2)
        / jnp.maximum(3.535 * a + 2.181 * a**2, 1e-30),
    )
    lam_tr = 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha2 * tan2_theta(w)))
    val = jnp.where(distrib == BECKMANN, lam_beck, lam_tr)
    return jnp.where(jnp.isfinite(abs_tan), val, 0.0)


def g1(distrib, alpha_x, alpha_y, w):
    return 1.0 / (1.0 + _lambda(distrib, alpha_x, alpha_y, w))


def g(distrib, alpha_x, alpha_y, wo, wi):
    """Height-correlated-ish masking-shadowing.
    [ref: geometry/src/microfacet.rs:106-108]"""
    return 1.0 / (
        1.0
        + _lambda(distrib, alpha_x, alpha_y, wo)
        + _lambda(distrib, alpha_x, alpha_y, wi)
    )


def pdf_wh(distrib, alpha_x, alpha_y, wo, wh):
    """Sampling density of wh: D(wh)·|cosθh| (full-NDF sampling, matching the
    compiled reference path, microfacet.rs:115-122)."""
    return d(distrib, alpha_x, alpha_y, wh) * jnp.abs(cos_theta(wh))


def sample_wh(distrib, alpha_x, alpha_y, wo, u2):
    """Sample a microfacet normal from D(wh)·cosθh.

    Beckmann [ref: geometry/src/microfacet.rs:125-159]; Trowbridge-Reitz via
    the closed-form inverse (the reference's `todo!()`), both with the
    anisotropic phi warp.
    """
    u, v = u2[..., 0], u2[..., 1]
    iso = alpha_x == alpha_y

    # Common anisotropic phi warp (same for both distributions).
    phi_aniso = jnp.arctan(
        alpha_y / alpha_x * jnp.tan(2.0 * _PI * v + 0.5 * _PI)
    )
    phi_aniso = phi_aniso + jnp.where(v >= 0.5, _PI, 0.0)
    phi = jnp.where(iso, 2.0 * _PI * v, phi_aniso)
    sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
    inv_a2 = jnp.where(
        iso,
        1.0 / jnp.maximum(alpha_x**2, 1e-30),
        (cos_phi / alpha_x) ** 2 + (sin_phi / alpha_y) ** 2,
    )

    log_sample = jnp.log(jnp.maximum(1.0 - u, 1e-30))
    tan2_beck = -log_sample / inv_a2
    # TR: tan²θ scaled by u/(1-u) along the warped alpha.
    tan2_tr = u / jnp.maximum(1.0 - u, 1e-30) / inv_a2
    tan2 = jnp.where(distrib == BECKMANN, tan2_beck, tan2_tr)

    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = cos_t * jnp.sqrt(jnp.maximum(tan2, 0.0))
    wh = vm.spherical_direction(sin_t, cos_t, phi)
    # Flip to wo's hemisphere. [ref: microfacet.rs:153]
    return vm.face_forward(wh, wo)
