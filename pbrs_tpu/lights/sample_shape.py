"""Sampling points on light shapes + solid-angle pdfs.

Vectorized over per-ray *gathered* shape parameters (each ray has already
chosen its light, so params are [N]-aligned, not a [N, K] product).
Replaces reference light/src/sample_shape.rs.

Fixed vs reference (COMPAT.md): `pdf_at` uses distance²/(|cosθ|·area) — the
reference drops the square on the distance (sample_shape.rs:28-33).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm
from ..geometry import ray as ray_mod
from ..bxdf.lobes import concentric_sample_disk

QUAD = 0
SPHERE = 1
DISK = 2
TRIANGLE = 3

_PI = jnp.pi


# -------------------- aligned single-shape intersections --------------------
# rays fields [N], shape params [N]: one shape per ray.


def _aligned_quad_hit(o, d, t_lo, t_hi, origin, eu, ev):
    n = vm.cross(eu, ev)
    denom = vm.dot(d, n)
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    t = vm.dot(origin - o, n) / denom_safe
    p = o + t[..., None] * d
    dv = p - origin
    n2 = jnp.maximum(vm.dot(n, n), 1e-30)
    u = vm.dot(vm.cross(dv, ev), n) / n2
    v = vm.dot(vm.cross(eu, dv), n) / n2
    ok = (
        (denom != 0.0)
        & (t >= t_lo) & (t < t_hi)
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
    )
    return ok, t, vm.normalize(n)


def _aligned_sphere_hit(o, d, t_lo, t_hi, center, radius):
    f = o - center
    a = vm.dot(d, d)
    b_prime = -vm.dot(f, d)
    mid = f + (b_prime / jnp.maximum(a, 1e-30))[..., None] * d
    delta = radius**2 - vm.dot(mid, mid)
    has = delta >= 0.0
    c = vm.dot(f, f) - radius**2
    q = b_prime + jnp.where(b_prime >= 0, 1.0, -1.0) * vm.safe_sqrt(delta * a)
    q_safe = jnp.where(q == 0.0, 1.0, q)
    t0 = c / q_safe
    t1 = q / jnp.maximum(a, 1e-30)
    t_low = jnp.minimum(t0, t1)
    t_high = jnp.maximum(t0, t1)
    ok_lo = (t_low >= t_lo) & (t_low < t_hi)
    ok_hi = (t_high >= t_lo) & (t_high < t_hi)
    t = jnp.where(ok_lo, t_low, t_high)
    ok = has & (q != 0.0) & (ok_lo | ok_hi)
    p = o + t[..., None] * d
    n = vm.normalize(p - center)
    return ok, t, n


def _aligned_disk_hit(o, d, t_lo, t_hi, center, normal, radial):
    denom = vm.dot(d, normal)
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    t = vm.dot(center - o, normal) / denom_safe
    p = o + t[..., None] * d
    inside = vm.dot(p - center, p - center) <= vm.dot(radial, radial)
    ok = (denom != 0.0) & (t >= t_lo) & (t < t_hi) & inside
    return ok, t, normal


def _aligned_tri_hit(o, d, t_lo, t_hi, p0, p1, p2):
    n = vm.normalize(vm.cross(p0 - p1, p2 - p1))
    denom = vm.dot(d, n)
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    t = vm.dot(p0 - o, n) / denom_safe
    p = o + t[..., None] * d
    b2 = vm.dot(vm.cross(p - p0, p - p1), n)
    b0 = vm.dot(vm.cross(p - p1, p - p2), n)
    b1 = vm.dot(vm.cross(p - p2, p - p0), n)
    inside = ((b0 > 0) & (b1 > 0) & (b2 > 0)) | ((b0 < 0) & (b1 < 0) & (b2 < 0))
    ok = (denom != 0.0) & (t >= t_lo) & (t < t_hi) & inside
    return ok, t, n


def intersect_shape(kind, params, origin, direction, t_lo=ray_mod.T_MIN,
                    t_hi=jnp.inf, present=(QUAD, SPHERE, DISK, TRIANGLE)):
    """Intersect per-ray rays with their per-ray light shape.

    params: dict with p0, p1, p2 ([N,3]) and scalar ([N]); interpretation per
    shape kind (quad: origin/edge_u/edge_v; sphere: center + radius(scalar);
    disk: center/normal/radial; triangle: vertices). `present` statically
    prunes shape kinds the scene's lights cannot have.
    Returns (hit_mask, t, light_normal)."""
    p0, p1, p2, scalar = params["p0"], params["p1"], params["p2"], params["scalar"]
    t_hi = jnp.broadcast_to(jnp.asarray(t_hi, jnp.float32), origin.shape[:-1])
    hits = {}
    if QUAD in present:
        hits[QUAD] = _aligned_quad_hit(origin, direction, t_lo, t_hi, p0, p1, p2)
    if SPHERE in present:
        hits[SPHERE] = _aligned_sphere_hit(origin, direction, t_lo, t_hi, p0,
                                           scalar)
    if DISK in present:
        hits[DISK] = _aligned_disk_hit(origin, direction, t_lo, t_hi, p0, p1, p2)
    if TRIANGLE in present:
        hits[TRIANGLE] = _aligned_tri_hit(origin, direction, t_lo, t_hi, p0,
                                          p1, p2)
    ok = jnp.zeros(origin.shape[:-1], bool)
    t = jnp.zeros(origin.shape[:-1], jnp.float32)
    n = jnp.zeros_like(origin)
    for kk, (okk, tk, nk) in hits.items():
        ok = jnp.where(kind == kk, okk, ok)
        t = jnp.where(kind == kk, tk, t)
        n = jnp.where((kind == kk)[..., None], nk, n)
    return ok, t, n


def shape_area(kind, params, present=(QUAD, SPHERE, DISK, TRIANGLE)):
    """[ref: light/src/sample_shape.rs:252-308]"""
    p0, p1, p2, scalar = params["p0"], params["p1"], params["p2"], params["scalar"]
    a = jnp.zeros(kind.shape, jnp.float32)
    if QUAD in present:
        a = jnp.where(kind == QUAD, vm.length(vm.cross(p1, p2)), a)
    if SPHERE in present:
        a = jnp.where(kind == SPHERE, 4.0 * _PI * scalar**2, a)
    if DISK in present:
        a = jnp.where(kind == DISK, _PI * vm.dot(p2, p2), a)
    if TRIANGLE in present:
        a = jnp.where(
            kind == TRIANGLE, 0.5 * vm.length(vm.cross(p0 - p1, p2 - p1)), a
        )
    return a


def sample_towards(kind, params, target_pos, u2,
                   present=(QUAD, SPHERE, DISK, TRIANGLE)):
    """Sample a point on the shape (visible-cone sampling for spheres).

    Returns (point [N,3], light_normal [N,3]); `present` statically prunes
    absent shape kinds. [ref: light/src/sample_shape.rs:184-309]
    """
    p0, p1, p2, scalar = params["p0"], params["p1"], params["p2"], params["scalar"]
    u, v = u2[..., 0], u2[..., 1]
    k3 = kind[..., None]
    pt = jnp.zeros_like(target_pos)
    n = jnp.zeros_like(target_pos)

    if QUAD in present:
        # Quad: uniform. [ref: sample_shape.rs:296-309]
        pt_quad = p0 + u[..., None] * p1 + v[..., None] * p2
        n_quad = vm.normalize(vm.cross(p1, p2))
        pt = jnp.where(k3 == QUAD, pt_quad, pt)
        n = jnp.where(k3 == QUAD, n_quad, n)

    if TRIANGLE in present:
        # Triangle: uniform with fold. [ref: sample_shape.rs:276-294]
        over = (u + v) > 1.0
        tu = jnp.where(over, 1.0 - v, u)
        tv = jnp.where(over, 1.0 - u, v)
        pt_tri = p0 + tu[..., None] * (p1 - p0) + tv[..., None] * (p2 - p0)
        n_tri = vm.normalize(vm.cross(p0 - p1, p2 - p1))
        pt = jnp.where(k3 == TRIANGLE, pt_tri, pt)
        n = jnp.where(k3 == TRIANGLE, n_tri, n)

    if DISK in present:
        # Disk: concentric. [ref: sample_shape.rs:257-269]
        dx, dy = concentric_sample_disk(u2)
        radial2 = vm.cross(p1, p2)
        pt_disk = p0 + dx[..., None] * p2 + dy[..., None] * radial2
        pt = jnp.where(k3 == DISK, pt_disk, pt)
        n = jnp.where(k3 == DISK, p1, n)

    if SPHERE in present:
        # Sphere: cone sampling from outside, uniform from inside.
        # [ref: sample_shape.rs:184-236]
        wc = p0 - target_pos
        dc2 = vm.dot(wc, wc)
        r2 = scalar**2
        inside = dc2 < r2
        theta_u = 2.0 * _PI * u
        phi_u = jnp.arccos(jnp.clip(2.0 * v - 1.0, -1.0, 1.0))
        dir_u = vm.vec3(
            jnp.sin(phi_u) * jnp.cos(theta_u),
            jnp.sin(phi_u) * jnp.sin(theta_u),
            2.0 * v - 1.0,
        )
        pt_sph_inside = p0 + scalar[..., None] * dir_u
        n_sph_inside = dir_u
        sin2_t_max = r2 / jnp.maximum(dc2, 1e-30)
        cos_t_max = vm.safe_sqrt(1.0 - sin2_t_max)
        cos_t = (1.0 - u) + u * cos_t_max
        sin2_t = jnp.maximum(1.0 - cos_t**2, 0.0)
        phi = v * 2.0 * _PI
        dc = jnp.sqrt(jnp.maximum(dc2, 1e-30))
        ds = dc * cos_t - vm.safe_sqrt(r2 - dc2 * sin2_t)
        cos_alpha = (dc2 + r2 - ds**2) / jnp.maximum(2.0 * dc * scalar, 1e-30)
        sin_alpha = vm.safe_sqrt(1.0 - cos_alpha**2)
        n_obj = vm.spherical_direction(sin_alpha, cos_alpha, phi)
        to_target = vm.normalize(-wc)
        bx, by = vm.make_coord_system(to_target)
        n_world = (
            n_obj[..., 0:1] * bx + n_obj[..., 1:2] * by
            + n_obj[..., 2:3] * to_target
        )
        pt_sph_outside = p0 + n_world * scalar[..., None]
        pt_sph = jnp.where(inside[..., None], pt_sph_inside, pt_sph_outside)
        n_sph = jnp.where(inside[..., None], n_sph_inside, n_world)
        pt = jnp.where(k3 == SPHERE, pt_sph, pt)
        n = jnp.where(k3 == SPHERE, n_sph, n)

    return pt, n


def pdf_at(kind, params, target_pos, wi,
           present=(QUAD, SPHERE, DISK, TRIANGLE)):
    """Solid-angle pdf that direction wi from target_pos hits the shape.

    Spheres use the uniform-cone pdf; other shapes re-intersect and convert
    area pdf to solid angle with the corrected distance² factor.
    [ref: light/src/sample_shape.rs:28-33 (distance² restored), 238-250]
    """
    p0, scalar = params["p0"], params["scalar"]
    area = shape_area(kind, params, present)
    pdf = jnp.zeros(kind.shape, jnp.float32)
    if SPHERE in present:
        wc = p0 - target_pos
        dc2 = vm.dot(wc, wc)
        r2 = scalar**2
        inside = dc2 < r2
        sin2_t_max = r2 / jnp.maximum(dc2, 1e-30)
        cos_t_max = vm.safe_sqrt(1.0 - sin2_t_max)
        cos_t = vm.dot(wc, wi) / jnp.maximum(
            jnp.sqrt(dc2) * vm.length(wi), 1e-30
        )
        cone = 1.0 / jnp.maximum(2.0 * _PI * (1.0 - cos_t_max), 1e-30)
        pdf_sphere = jnp.where(
            inside,
            1.0 / jnp.maximum(area, 1e-30),
            jnp.where(cos_t > cos_t_max, cone, 0.0),
        )
        pdf = jnp.where(kind == SPHERE, pdf_sphere, pdf)
    generic = tuple(k for k in present if k != SPHERE)
    if generic:
        wi_n = vm.normalize(wi)
        ok, t, n = intersect_shape(kind, params, target_pos, wi_n,
                                   present=generic)
        d2 = t**2
        cos_l = jnp.abs(vm.dot(n, -wi_n))
        pdf_generic = jnp.where(
            ok, d2 / jnp.maximum(cos_l * area, 1e-30), 0.0
        )
        pdf = jnp.where(kind != SPHERE, pdf_generic, pdf)
    return pdf
