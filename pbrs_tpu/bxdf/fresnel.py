"""Fresnel reflectance models, vectorized.

[ref: geometry/src/bxdf.rs:282-393]
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm

NOP = 0
DIELECTRIC = 1
CONDUCTOR = 2


def dielectric_refl(cos_theta_i, eta_front, eta_back):
    """Unpolarized Fresnel reflectance for a dielectric interface. Negative
    cos means hitting from the back side (etas swap).
    [ref: geometry/src/bxdf.rs:308-342]"""
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_i > 0.0
    eta_i = jnp.where(entering, eta_front, eta_back)
    eta_t = jnp.where(entering, eta_back, eta_front)
    cos_i = jnp.abs(cos_i)
    sin_i = vm.safe_sqrt(1.0 - cos_i**2)
    sin_t = eta_i / eta_t * sin_i
    tir = sin_t >= 1.0
    cos_t = vm.safe_sqrt(1.0 - sin_t**2)
    r_perp = (eta_i * cos_i - eta_t * cos_t) / jnp.maximum(
        eta_i * cos_i + eta_t * cos_t, 1e-30
    )
    r_par = (eta_t * cos_i - eta_i * cos_t) / jnp.maximum(
        eta_t * cos_i + eta_i * cos_t, 1e-30
    )
    r = 0.5 * (r_par**2 + r_perp**2)
    return jnp.where(tir, 1.0, r)


def conductor_refl(cos_theta_i, eta_t, k, eta_i=1.0):
    """Per-channel conductor Fresnel (eta_t, k: [..., 3]).
    [ref: geometry/src/bxdf.rs:368-390]"""
    eta = eta_t / eta_i
    etak = k / eta_i
    cos2 = jnp.clip(cos_theta_i, -1.0, 1.0) ** 2
    sin2 = 1.0 - cos2
    cos2 = cos2[..., None]
    sin2 = sin2[..., None]
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * jnp.sqrt(jnp.maximum(cos2, 0.0))
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-30)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-30)
    return jnp.maximum(0.5 * (rs + rp), 0.0)


def eval_color(kind, cos_theta_i, eta_front, eta_back, eta_t, k):
    """Dispatch to the right model; returns [..., 3] reflectance.
    kind: int array broadcastable against cos_theta_i."""
    diel = dielectric_refl(cos_theta_i, eta_front, eta_back)[..., None]
    cond = conductor_refl(cos_theta_i, eta_t, k)
    ones = jnp.ones_like(diel)
    out = jnp.where(kind[..., None] == DIELECTRIC, diel, ones)
    return jnp.where(kind[..., None] == CONDUCTOR, cond, out)


def schlick(cosine, ref_index):
    """Schlick approximation. [ref: src/../material/src/lib.rs:477-481]"""
    r0 = ((1.0 - ref_index) / (1.0 + ref_index)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5
