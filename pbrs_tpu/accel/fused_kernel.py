"""Fused per-bounce megakernel for diffuse table scenes.

One Pallas kernel executes an entire wavefront bounce — closest-hit over
the primitive bank, hit detail, material fetch, emission, one-light NEE
with MIS (including both shadow-ray occlusion sweeps), cosine BSDF
sampling, Russian roulette and next-ray spawn — with every intermediate in
VMEM. This is *shader specialization*: the scene compiler picks this kernel
when the material set is pure-Lambert with solid albedos and the area
lights are quads (the Cornell family); anything richer runs the general
jnp wavefront (integrators/wavefront.py), which this kernel matches
numerically (same counter-based RNG streams).

[ref: the fused equivalent of src/pathintegrator.rs:9-74 +
 src/directlighting.rs:58-232]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bxdf import lobes as lb
from ..core import sampler as smp
from ..geometry import ray as ray_mod
from ..lights import lights as lt
from ..lights import sample_shape as ss
from . import trace_pallas

LANES = 128
BLOCK_ROWS = 64
T_MIN = ray_mod.T_MIN
BIG = 3.0e38
SPAWN_EPS = ray_mod.SPAWN_EPS
INV_PI = 1.0 / np.pi


def scene_supports_fused(scene) -> bool:
    """Fast-path eligibility: Lambert-only solid materials, quad area
    lights, <=1 area light arm complexity, gradient/const/none env."""
    if getattr(scene, "instanced", ()):
        return False  # trace-time instance groups -> general path
    mt = scene.materials
    if tuple(mt.present_kinds) not in ((lb.LAMBERT,), ()):
        return False
    if mt.textured_slots:
        return False
    if scene.delta_lights.count > 0:
        return False  # (delta arm not yet in-kernel)
    if scene.area_lights.count > 0:
        kinds = set(np.asarray(scene.area_lights.shape_kind)[
            : scene.area_lights.count].tolist())
        if kinds - {ss.QUAD}:
            return False
    if scene.env.kind not in (lt.ENV_NONE, lt.ENV_CONST, lt.ENV_GRADIENT):
        return False
    if scene.materials.kind.shape[0] > 64:
        return False
    # This kernel's detail pass covers spheres + quads only: any REAL
    # triangle or disk (non-degenerate; padding dummies never hit) routes
    # to the single-lobe kernel (which has tri/disk detail) or the general
    # path.
    geom = scene.geom
    tri_n = np.cross(
        np.asarray(geom.tri_p0) - np.asarray(geom.tri_p1),
        np.asarray(geom.tri_p2) - np.asarray(geom.tri_p1),
    )
    if (np.linalg.norm(tri_n, axis=-1) > 0).any():
        return False
    if (np.linalg.norm(np.asarray(geom.disk_radial), axis=-1) > 0).any():
        return False
    return True


# --------------------------- in-kernel helpers -----------------------------


def _hash_u32(*counters):
    """Identical stream to core/sampler.py's PCG hash (u32 VPU math)."""
    h = jnp.uint32(0x9E3779B9)
    for c in counters:
        k = c.astype(jnp.uint32) if hasattr(c, "astype") else jnp.uint32(c)
        k = k * jnp.uint32(0xCC9E2D51)
        k = (k << jnp.uint32(15)) | (k >> jnp.uint32(17))
        k = k * jnp.uint32(0x1B873593)
        h = h ^ k
        h = (h << jnp.uint32(13)) | (h >> jnp.uint32(19))
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    # PCG output permutation
    word = ((h >> ((h >> jnp.uint32(28)) + jnp.uint32(4))) ^ h) * jnp.uint32(
        277803737
    )
    return (word >> jnp.uint32(22)) ^ word


def _uniform(bits):
    # Mosaic lacks u32->f32; the top 24 bits fit int32 exactly.
    top = (bits >> jnp.uint32(8)).astype(jnp.int32)
    return top.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _reverse_bits_u32(x):
    x = x.astype(jnp.uint32)
    x = (x << jnp.uint32(16)) | (x >> jnp.uint32(16))
    x = (((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
         | ((x & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)))
    x = (((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
         | ((x & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)))
    x = (((x & jnp.uint32(0x33333333)) << jnp.uint32(2))
         | ((x & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)))
    x = (((x & jnp.uint32(0x55555555)) << jnp.uint32(1))
         | ((x & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)))
    return x


def _laine_karras(x, seed_key):
    x = x.astype(jnp.uint32) + seed_key.astype(jnp.uint32)
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def _nested_scramble(x, seed_key):
    return _reverse_bits_u32(_laine_karras(_reverse_bits_u32(x), seed_key))


def _sobol_u32(index, dim):
    index = index.astype(jnp.uint32)
    if dim == 0:
        return _reverse_bits_u32(index)
    out = jnp.zeros(jnp.shape(index), jnp.uint32)
    for k in range(32):
        bit = (index >> jnp.uint32(k)) & jnp.uint32(1)
        out = out ^ (bit * jnp.uint32(smp._SOBOL_DIM1[k]))
    return out


def _u1(seed, pixel, sample, bounce, dim, lane=0, rng="pcg"):
    """In-kernel uniform draw, stream-identical to core/sampler.py.

    rng='pcg' reproduces PCGSampler.u1(pixel, sample, bounce, dim, lane).
    rng='sobol' reproduces SobolSampler: lane selects the base-2 Sobol'
    dimension of the (bounce, dim) pair — lane 0 == SobolSampler.u1 and
    the u2 first component, lane 1 == the u2 second component (the core
    sampler keys both pair components with hash-lane 0)."""
    if rng == "pcg":
        return _uniform(_hash_u32(seed, pixel, sample, bounce * 16 + dim,
                                  jnp.uint32(lane)))
    assert rng == "sobol", rng
    dkey = bounce * 16 + dim
    zero = jnp.uint32(0)
    shuffle_key = _hash_u32(seed, pixel, dkey, zero,
                            jnp.uint32(0x51633E2D))
    scramble_key = _hash_u32(seed, pixel, dkey, zero,
                             jnp.uint32(0x68BC21EB) + jnp.uint32(lane))
    idx = _nested_scramble(sample.astype(jnp.uint32)
                           if hasattr(sample, "astype")
                           else jnp.uint32(sample), shuffle_key)
    return _uniform(_nested_scramble(_sobol_u32(idx, lane), scramble_key))


def rng_kind(sampler) -> str:
    """Static in-kernel RNG selector for a core sampler instance."""
    if isinstance(sampler, smp.SobolSampler):
        return "sobol"
    if isinstance(sampler, smp.PCGSampler):
        return "pcg"
    raise TypeError(
        f"fused kernels reproduce PCG/Sobol streams in-kernel; "
        f"{type(sampler).__name__} must use the general wavefront")


def _concentric_disk(x, y):
    """Uniform unit-disk map on [-1,1]² planes (Shirley-Chiu), matching
    bxdf/lobes.concentric_sample_disk — the reference's polar form
    (bxdf.rs:187-200) is azimuthally biased ±33%, COMPAT.md."""
    big = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(big, x, y)
    xs = jnp.where(x == 0.0, 1.0, x)
    ys = jnp.where(y == 0.0, 1.0, y)
    theta = jnp.where(
        big,
        jnp.float32(np.pi / 4.0) * (y / xs),
        jnp.float32(np.pi / 2.0) - jnp.float32(np.pi / 4.0) * (x / ys),
    )
    px = r * jnp.cos(theta)
    py = r * jnp.sin(theta)
    deg = (x == 0.0) & (y == 0.0)
    return jnp.where(deg, 0.0, px), jnp.where(deg, 0.0, py)


def _trace_tables(cols, counts, rox, roy, roz, rdx, rdy, rdz, t_max,
                  want_closest=True):
    """Closest-hit (t, prim) or any-hit over the SMEM prim columns — shared
    logic with trace_pallas but inlined for fusion."""
    n_sph, n_quad, n_tri, n_disk = counts
    t_best = jnp.full(rox.shape, BIG, jnp.float32)
    idx_best = jnp.full(rox.shape, -1, jnp.int32)

    def consider(t, ok, pid, carry):
        t_b, i_b = carry
        t = jnp.where(ok & (t >= T_MIN) & (t < t_max), t, BIG)
        closer = t < t_b
        return jnp.where(closer, t, t_b), jnp.where(closer, pid, i_b)

    def sphere_body(i, carry):
        p = lambda j: cols[j][i]
        cx, cy, cz, r = p(0), p(1), p(2), p(3)
        fx, fy, fz = rox - cx, roy - cy, roz - cz
        a = rdx * rdx + rdy * rdy + rdz * rdz
        b_pr = -(fx * rdx + fy * rdy + fz * rdz)
        inv_a = 1.0 / jnp.maximum(a, 1e-30)
        mx = fx + b_pr * inv_a * rdx
        my = fy + b_pr * inv_a * rdy
        mz = fz + b_pr * inv_a * rdz
        delta = r * r - (mx * mx + my * my + mz * mz)
        has = delta >= 0.0
        c = fx * fx + fy * fy + fz * fz - r * r
        q = b_pr + jnp.where(b_pr >= 0.0, 1.0, -1.0) * jnp.sqrt(
            jnp.maximum(delta * a, 0.0)
        )
        q_s = jnp.where(q == 0.0, 1.0, q)
        t0 = c / q_s
        t1 = q * inv_a
        t_lo = jnp.minimum(t0, t1)
        t_hi = jnp.maximum(t0, t1)
        ok = has & (q != 0.0)
        lo_ok = ok & (t_lo >= T_MIN) & (t_lo < t_max)
        t = jnp.where(lo_ok, t_lo, t_hi)
        return consider(t, ok, i, carry)

    def quad_body(i, carry):
        p = lambda j: cols[j][n_sph + i]
        ox_, oy_, oz_ = p(0), p(1), p(2)
        ux, uy, uz = p(3), p(4), p(5)
        vx, vy, vz = p(6), p(7), p(8)
        nx, ny, nz = p(9), p(10), p(11)
        inv_n2 = 1.0 / p(12)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((ox_ - rox) * nx + (oy_ - roy) * ny + (oz_ - roz) * nz) / denom_s
        px = rox + t * rdx - ox_
        py = roy + t * rdy - oy_
        pz = roz + t * rdz - oz_
        cx = py * vz - pz * vy
        cy = pz * vx - px * vz
        cz = px * vy - py * vx
        uu = (cx * nx + cy * ny + cz * nz) * inv_n2
        cx = uy * pz - uz * py
        cy = uz * px - ux * pz
        cz = ux * py - uy * px
        vv = (cx * nx + cy * ny + cz * nz) * inv_n2
        ok = (
            (denom != 0.0)
            & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0) & (vv <= 1.0)
        )
        return consider(t, ok, n_sph + i, carry)

    def tri_body(i, carry):
        p = lambda j: cols[j][n_sph + n_quad + i]
        p0x, p0y, p0z = p(0), p(1), p(2)
        nx, ny, nz = p(9), p(10), p(11)
        p1x, p1y, p1z = p(3), p(4), p(5)
        p2x, p2y, p2z = p(6), p(7), p(8)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((p0x - rox) * nx + (p0y - roy) * ny + (p0z - roz) * nz) / denom_s
        hx = rox + t * rdx
        hy = roy + t * rdy
        hz = roz + t * rdz

        def edge(ax, ay, az, bx, by, bz):
            ex, ey, ez = hx - ax, hy - ay, hz - az
            fx, fy, fz = hx - bx, hy - by, hz - bz
            return (
                (ey * fz - ez * fy) * nx
                + (ez * fx - ex * fz) * ny
                + (ex * fy - ey * fx) * nz
            )

        b2 = edge(p0x, p0y, p0z, p1x, p1y, p1z)
        b0 = edge(p1x, p1y, p1z, p2x, p2y, p2z)
        b1 = edge(p2x, p2y, p2z, p0x, p0y, p0z)
        inside = ((b0 > 0) & (b1 > 0) & (b2 > 0)) | (
            (b0 < 0) & (b1 < 0) & (b2 < 0)
        )
        ok = (denom != 0.0) & inside
        return consider(t, ok, n_sph + n_quad + i, carry)

    def disk_body(i, carry):
        p = lambda j: cols[j][n_sph + n_quad + n_tri + i]
        cx_, cy_, cz_ = p(0), p(1), p(2)
        nx, ny, nz = p(3), p(4), p(5)
        r2 = p(6)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((cx_ - rox) * nx + (cy_ - roy) * ny + (cz_ - roz) * nz) / denom_s
        px = rox + t * rdx - cx_
        py = roy + t * rdy - cy_
        pz = roz + t * rdz - cz_
        inside = px * px + py * py + pz * pz <= r2
        ok = (denom != 0.0) & inside
        return consider(t, ok, n_sph + n_quad + n_tri + i, carry)

    carry = (t_best, idx_best)
    carry = jax.lax.fori_loop(0, n_sph, sphere_body, carry)
    carry = jax.lax.fori_loop(0, n_quad, quad_body, carry)
    carry = jax.lax.fori_loop(0, n_tri, tri_body, carry)
    carry = jax.lax.fori_loop(0, n_disk, disk_body, carry)
    return carry


def _occluded(cols, counts, ox, oy, oz, dx, dy, dz, t_max):
    t, _ = _trace_tables(cols, counts, ox, oy, oz, dx, dy, dz, t_max)
    return t < BIG


def _bounce_kernel(
    *refs,
    counts, n_mats, n_area, env_kind, bounce_is_first, rr_active,
    rng="pcg",
):
    cols = refs[:16]
    (mats_ref, lights_ref, ints_ref, scal_ref) = refs[16:20]
    (ox, oy, oz, dx, dy, dz, beta_r, beta_g, beta_b, alive_in, pixel,
     sample) = refs[20:32]
    (rad_r, rad_g, rad_b, nox, noy, noz, ndx, ndy, ndz,
     beta_r_o, beta_g_o, beta_b_o, alive_out, raycnt) = refs[32:46]
    """One full wavefront bounce over a ray tile.

    ints_ref (SMEM i32): [seed, bounce]; scal_ref (SMEM f32): env colors x6.
    mats_ref (SMEM): [M, 6] albedo rgb + emission rgb.
    lights_ref (SMEM): [A, 12] quad origin/u/v + emit rgb.
    """
    # Whole-block early-out (see fused_single_lobe): all-dead blocks write
    # pass-through outputs and skip the bounce body entirely.
    _zzf = jnp.zeros(ox.shape, jnp.float32)
    _zzi = jnp.zeros(ox.shape, jnp.int32)
    rad_r[...] = _zzf
    rad_g[...] = _zzf
    rad_b[...] = _zzf
    nox[...] = ox[...]
    noy[...] = oy[...]
    noz[...] = oz[...]
    ndx[...] = dx[...]
    ndy[...] = dy[...]
    ndz[...] = dz[...]
    beta_r_o[...] = beta_r[...]
    beta_g_o[...] = beta_g[...]
    beta_b_o[...] = beta_b[...]
    alive_out[...] = _zzi
    raycnt[...] = _zzf

    @pl.when(jnp.any(alive_in[...] > 0))
    def _run_block():
        rox, roy, roz = ox[...], oy[...], oz[...]
        rdx, rdy, rdz = dx[...], dy[...], dz[...]
        beta = (beta_r[...], beta_g[...], beta_b[...])
        alive = alive_in[...] > 0
        pix = pixel[...].astype(jnp.uint32)
        smp_id = sample[...].astype(jnp.uint32)
        seed = ints_ref[0].astype(jnp.uint32)
        bounce = ints_ref[1].astype(jnp.uint32)
        inf = jnp.full(rox.shape, jnp.inf, jnp.float32)

        n_rays = jnp.zeros((), jnp.float32)
        n_rays += jnp.sum(alive.astype(jnp.float32))

        # ---- closest hit + detail ----
        t, pid = _trace_tables(cols, counts, rox, roy, roz, rdx, rdy, rdz, inf)
        hit = t < BIG
        t_safe = jnp.where(hit, t, 1.0)

        n_sph, n_quad, n_tri, n_disk = counts
        # Detail via a masked sweep over the prim bank (same loops, winner-only
        # updates). For table scenes the bank is tiny.
        px = rox + t_safe * rdx
        py = roy + t_safe * rdy
        pz = roz + t_safe * rdz
        nx = jnp.zeros_like(rox)
        ny = jnp.zeros_like(rox)
        nz = jnp.ones_like(rox)
        tx = jnp.ones_like(rox)
        ty = jnp.zeros_like(rox)
        tz = jnp.zeros_like(rox)
        mat_id = jnp.full(rox.shape, -1, jnp.int32)

        def detail_sphere(i, carry):
            nx, ny, nz, tx, ty, tz, pxx, pyy, pzz, mat = carry
            sel = pid == i
            p = lambda j: cols[j][i]
            cx, cy, cz, r = p(0), p(1), p(2), p(3)
            gx, gy, gz = px - cx, py - cy, pz - cz
            inv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
            ux, uy, uz = gx * inv, gy * inv, gz * inv
            # dpdu = normalize(-n.y, n.x, 0) with X fallback
            # [ref shapes/intersect._sphere_detail]
            h2 = ux * ux + uy * uy
            hinv = jax.lax.rsqrt(jnp.maximum(h2, 1e-30))
            dx_ = jnp.where(h2 < 1e-12, 1.0, -uy * hinv)
            dy_ = jnp.where(h2 < 1e-12, 0.0, ux * hinv)
            # push out + face forward
            s = jnp.where(ux * rdx + uy * rdy + uz * rdz > 0.0, -1.0, 1.0)
            r_out = r * 1.00001
            return (
                jnp.where(sel, s * ux, nx), jnp.where(sel, s * uy, ny),
                jnp.where(sel, s * uz, nz),
                jnp.where(sel, dx_, tx), jnp.where(sel, dy_, ty),
                jnp.where(sel, 0.0, tz),
                jnp.where(sel, cx + ux * r_out, pxx),
                jnp.where(sel, cy + uy * r_out, pyy),
                jnp.where(sel, cz + uz * r_out, pzz),
                jnp.where(sel, cols[13][i].astype(jnp.int32), mat),
            )

        def detail_quad(i, carry):
            nx, ny, nz, tx, ty, tz, pxx, pyy, pzz, mat = carry
            sel = pid == (n_sph + i)
            p = lambda j: cols[j][n_sph + i]
            qnx, qny, qnz = p(9), p(10), p(11)
            inv = jax.lax.rsqrt(jnp.maximum(
                qnx * qnx + qny * qny + qnz * qnz, 1e-30))
            ux, uy, uz = qnx * inv, qny * inv, qnz * inv
            s = jnp.where(ux * rdx + uy * rdy + uz * rdz > 0.0, -1.0, 1.0)
            return (
                jnp.where(sel, s * ux, nx), jnp.where(sel, s * uy, ny),
                jnp.where(sel, s * uz, nz),
                jnp.where(sel, p(3), tx), jnp.where(sel, p(4), ty),
                jnp.where(sel, p(5), tz),
                pxx, pyy, pzz,
                jnp.where(sel, cols[13][n_sph + i].astype(jnp.int32), mat),
            )

        carry = (nx, ny, nz, tx, ty, tz, px, py, pz, mat_id)
        carry = jax.lax.fori_loop(0, n_sph, detail_sphere, carry)
        carry = jax.lax.fori_loop(0, n_quad, detail_quad, carry)
        nx, ny, nz, tx, ty, tz, px, py, pz, mat_id = carry

        # Shading frame matching vm.orthonormal_frame(normal, dpdu): bitangent
        # from the hint, Duff ONB fallback on degenerate hints.
        bx = ny * tz - nz * ty
        by = nz * tx - nx * tz
        bz = nx * ty - ny * tx
        b2 = bx * bx + by * by + bz * bz
        good = b2 > 1e-12
        sD = jnp.where(nz >= 0.0, 1.0, -1.0)
        aD = -1.0 / (sD + nz)
        bD = nx * ny * aD
        atx = 1.0 + sD * nx * nx * aD
        aty = sD * bD
        atz = -sD * nx
        fbx = ny * atz - nz * aty
        fby = nz * atx - nx * atz
        fbz = nx * aty - ny * atx
        bx = jnp.where(good, bx, fbx)
        by = jnp.where(good, by, fby)
        bz = jnp.where(good, bz, fbz)
        binv = jax.lax.rsqrt(jnp.maximum(bx * bx + by * by + bz * bz, 1e-30))
        bx, by, bz = bx * binv, by * binv, bz * binv
        fx_ = by * nz - bz * ny
        fy_ = bz * nx - bx * nz
        fz_ = bx * ny - by * nx
        # frame columns: t=(fx_,fy_,fz_), b=(bx,by,bz), n

        # ---- material fetch (albedo + emission) ----
        alb_r = jnp.zeros_like(rox)
        alb_g = jnp.zeros_like(rox)
        alb_b = jnp.zeros_like(rox)
        emi_r = jnp.zeros_like(rox)
        emi_g = jnp.zeros_like(rox)
        emi_b = jnp.zeros_like(rox)

        def mat_body(m, carry):
            ar, ag, ab, er, eg, eb = carry
            sel = mat_id == m
            return (
                jnp.where(sel, mats_ref[m, 0], ar),
                jnp.where(sel, mats_ref[m, 1], ag),
                jnp.where(sel, mats_ref[m, 2], ab),
                jnp.where(sel, mats_ref[m, 3], er),
                jnp.where(sel, mats_ref[m, 4], eg),
                jnp.where(sel, mats_ref[m, 5], eb),
            )

        alb_r, alb_g, alb_b, emi_r, emi_g, emi_b = jax.lax.fori_loop(
            0, n_mats, mat_body, (alb_r, alb_g, alb_b, emi_r, emi_g, emi_b)
        )

        # ---- env radiance (miss) ----
        if env_kind == lt.ENV_GRADIENT:
            dlen = jax.lax.rsqrt(jnp.maximum(
                rdx * rdx + rdy * rdy + rdz * rdz, 1e-30))
            yy = (rdy * dlen + 1.0) * 0.5
            env_r = scal_ref[0] * yy + scal_ref[3] * (1.0 - yy)
            env_g = scal_ref[1] * yy + scal_ref[4] * (1.0 - yy)
            env_b = scal_ref[2] * yy + scal_ref[5] * (1.0 - yy)
        elif env_kind == lt.ENV_CONST:
            env_r = jnp.full_like(rox, 1.0) * scal_ref[0]
            env_g = jnp.full_like(rox, 1.0) * scal_ref[1]
            env_b = jnp.full_like(rox, 1.0) * scal_ref[2]
        else:
            env_r = env_g = env_b = jnp.zeros_like(rox)

        # Emission only on camera segments (no delta lobes in this kernel).
        # [ref: pathintegrator.rs:19-22]
        rad_out_r = jnp.zeros_like(rox)
        rad_out_g = jnp.zeros_like(rox)
        rad_out_b = jnp.zeros_like(rox)
        if bounce_is_first:
            seen_r = jnp.where(hit, emi_r, env_r)
            seen_g = jnp.where(hit, emi_g, env_g)
            seen_b = jnp.where(hit, emi_b, env_b)
            rad_out_r += jnp.where(alive, beta[0] * seen_r, 0.0)
            rad_out_g += jnp.where(alive, beta[1] * seen_g, 0.0)
            rad_out_b += jnp.where(alive, beta[2] * seen_b, 0.0)

        alive = alive & hit

        # ---- NEE: pick one light among n_area (+ env) ----
        has_env = 1 if env_kind != lt.ENV_NONE else 0
        n_lights = n_area + has_env
        if n_lights > 0:
            u_sel = _u1(seed, pix, smp_id, bounce, smp.DIM_LIGHT_SELECT,
                        rng=rng)
            u_l0 = _u1(seed, pix, smp_id, bounce, smp.DIM_LIGHT_UV, 0,
                       rng=rng)
            u_l1 = _u1(seed, pix, smp_id, bounce, smp.DIM_LIGHT_UV, 1,
                       rng=rng)
            u_s0 = _u1(seed, pix, smp_id, bounce, smp.DIM_SCATTER_UV, 0,
                       rng=rng)
            u_s1 = _u1(seed, pix, smp_id, bounce, smp.DIM_SCATTER_UV, 1,
                       rng=rng)
            chosen = jnp.minimum(
                (u_sel * n_lights).astype(jnp.int32), n_lights - 1
            )
            arm_area = chosen < n_area
            arm_env = ~arm_area

            # Gather chosen quad-light params by masked loop.
            lqx = jnp.zeros_like(rox); lqy = jnp.zeros_like(rox)
            lqz = jnp.zeros_like(rox)
            lux = jnp.zeros_like(rox); luy = jnp.zeros_like(rox)
            luz = jnp.zeros_like(rox)
            lvx = jnp.zeros_like(rox); lvy = jnp.zeros_like(rox)
            lvz = jnp.zeros_like(rox)
            ler = jnp.zeros_like(rox); leg = jnp.zeros_like(rox)
            leb = jnp.zeros_like(rox)

            def light_body(a, carry):
                (qx, qy, qz, ux, uy, uz, vx, vy, vz, er, eg, eb) = carry
                sel = chosen == a
                g = lambda j: lights_ref[a, j]
                return (
                    jnp.where(sel, g(0), qx), jnp.where(sel, g(1), qy),
                    jnp.where(sel, g(2), qz), jnp.where(sel, g(3), ux),
                    jnp.where(sel, g(4), uy), jnp.where(sel, g(5), uz),
                    jnp.where(sel, g(6), vx), jnp.where(sel, g(7), vy),
                    jnp.where(sel, g(8), vz), jnp.where(sel, g(9), er),
                    jnp.where(sel, g(10), eg), jnp.where(sel, g(11), eb),
                )

            (lqx, lqy, lqz, lux, luy, luz, lvx, lvy, lvz, ler, leg,
             leb) = jax.lax.fori_loop(
                0, n_area, light_body,
                (lqx, lqy, lqz, lux, luy, luz, lvx, lvy, lvz, ler, leg, leb),
            )

            # quad normal + area
            lnx = luy * lvz - luz * lvy
            lny = luz * lvx - lux * lvz
            lnz = lux * lvy - luy * lvx
            ln2 = jnp.maximum(lnx * lnx + lny * lny + lnz * lnz, 1e-30)
            area = jnp.sqrt(ln2)
            inv_ln = jax.lax.rsqrt(ln2)
            lnx_u, lny_u, lnz_u = lnx * inv_ln, lny * inv_ln, lnz * inv_ln

            # ---- light-sampled arm ----
            ptx = lqx + u_l0 * lux + u_l1 * lvx
            pty = lqy + u_l0 * luy + u_l1 * lvy
            ptz = lqz + u_l0 * luz + u_l1 * lvz
            wlx, wly, wlz = ptx - px, pty - py, ptz - pz
            d2 = jnp.maximum(wlx * wlx + wly * wly + wlz * wlz, 1e-20)
            inv_d = jax.lax.rsqrt(d2)
            wix, wiy, wiz = wlx * inv_d, wly * inv_d, wlz * inv_d
            cos_l = -(lnx_u * wix + lny_u * wiy + lnz_u * wiz)
            facing = cos_l > 0.0
            # pdf = d² / (|cosθl| · A)
            pdf_l = d2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-20)
            cos_s = nx * wix + ny * wiy + nz * wiz
            # f·|cos| for lambert; reflection-only, so zero across the
            # horizon (the frame normal faces wo, making cos_s the
            # same-hemisphere test; matches bxdf/lobes.py eval_lobe —
            # the reference leaks here, src/bsdf.rs:43-51, COMPAT.md)
            fl = jnp.maximum(cos_s, 0.0) * INV_PI
            # scatter pdf for MIS weight: cosine-hemisphere
            pdf_scatter = jnp.maximum(cos_s, 0.0) * INV_PI
            # shadow ray: spawn eps along normal toward the light; t in [0,1)
            side = jnp.where(cos_s >= 0.0, 1.0, -1.0)
            sox = px + side * nx * SPAWN_EPS
            soy = py + side * ny * SPAWN_EPS
            soz = pz + side * nz * SPAWN_EPS
            sdx, sdy, sdz = ptx - sox, pty - soy, ptz - soz
            occ1 = _occluded(cols, counts, sox, soy, soz, sdx, sdy, sdz,
                             jnp.full_like(rox, 1.0 - 1e-3))
            w_l = pdf_l * pdf_l / jnp.maximum(
                pdf_l * pdf_l + pdf_scatter * pdf_scatter, 1e-30
            )
            valid_l = arm_area & facing & ~occ1 & (pdf_l > 0.0)
            contrib = jnp.where(valid_l, fl * w_l / pdf_l, 0.0)
            rad_out_r += jnp.where(alive, beta[0] * alb_r * contrib * ler
                                   * n_lights, 0.0)
            rad_out_g += jnp.where(alive, beta[1] * alb_g * contrib * leg
                                   * n_lights, 0.0)
            rad_out_b += jnp.where(alive, beta[2] * alb_b * contrib * leb
                                   * n_lights, 0.0)

            # ---- BSDF-sampled arm (area MIS + env) ----
            # cosine hemisphere sample in the hit frame; single-lobe sampling
            # consumes (v, remapped u) [ref: src/bsdf.rs:79].
            ux_ = u_s1 * 2.0 - 1.0
            uy_ = u_s0 * 2.0 - 1.0
            ddx, ddy = _concentric_disk(ux_, uy_)
            ddz = jnp.sqrt(jnp.maximum(1.0 - ddx * ddx - ddy * ddy, 0.0))
            w2x = ddx * fx_ + ddy * bx + ddz * nx
            w2y = ddx * fy_ + ddy * by + ddz * ny
            w2z = ddx * fz_ + ddy * bz + ddz * nz
            cos2 = jnp.maximum(ddz, 0.0)
            pdf2 = cos2 * INV_PI
            f2 = cos2 * INV_PI  # f·|cos| / albedo

            # does wi2 hit the chosen light quad?
            denom = w2x * lnx_u + w2y * lny_u + w2z * lnz_u
            denom_s = jnp.where(denom == 0.0, 1.0, denom)
            s2ox = px + jnp.where(cos2 >= 0, 1.0, -1.0) * nx * SPAWN_EPS
            s2oy = py + jnp.where(cos2 >= 0, 1.0, -1.0) * ny * SPAWN_EPS
            s2oz = pz + jnp.where(cos2 >= 0, 1.0, -1.0) * nz * SPAWN_EPS
            t_hit = ((lqx - s2ox) * lnx_u + (lqy - s2oy) * lny_u
                     + (lqz - s2oz) * lnz_u) / denom_s
            hxq = s2ox + t_hit * w2x - lqx
            hyq = s2oy + t_hit * w2y - lqy
            hzq = s2oz + t_hit * w2z - lqz
            cqx = hyq * lvz - hzq * lvy
            cqy = hzq * lvx - hxq * lvz
            cqz = hxq * lvy - hyq * lvx
            uu = (cqx * lnx + cqy * lny + cqz * lnz) / ln2
            cqx = luy * hzq - luz * hyq
            cqy = luz * hxq - lux * hzq
            cqz = lux * hyq - luy * hxq
            vv = (cqx * lnx + cqy * lny + cqz * lnz) / ln2
            hit_l = (
                (denom != 0.0) & (t_hit >= T_MIN)
                & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0) & (vv <= 1.0)
            )
            facing2 = -(lnx_u * w2x + lny_u * w2y + lnz_u * w2z) > 0.0
            pdf_l2 = (t_hit * t_hit) * (w2x * w2x + w2y * w2y + w2z * w2z) \
                / jnp.maximum(
                    jnp.abs(lnx_u * w2x + lny_u * w2y + lnz_u * w2z) * area,
                    1e-20,
                )
            # shadow trace along wi2 — bounded to the light point on the area
            # arm, unbounded on the env arm.
            tmax2 = jnp.where(arm_area & hit_l, t_hit * (1.0 - 1e-3), inf)
            occ2 = _occluded(cols, counts, s2ox, s2oy, s2oz,
                             w2x, w2y, w2z, tmax2)
            w_b = pdf2 * pdf2 / jnp.maximum(pdf2 * pdf2 + pdf_l2 * pdf_l2, 1e-30)
            # radiance_to is two-sided in the reference (light/src/lib.rs:141-146)
            # and in the general path; facing is not tested here.
            del facing2
            valid_b = (
                arm_area & hit_l & ~occ2 & (pdf2 > 0.0) & (pdf_l2 > 0.0)
            )
            contrib_b = jnp.where(valid_b, f2 * w_b / jnp.maximum(pdf2, 1e-20),
                                  0.0)
            rad_out_r += jnp.where(alive, beta[0] * alb_r * contrib_b * ler
                                   * n_lights, 0.0)
            rad_out_g += jnp.where(alive, beta[1] * alb_g * contrib_b * leg
                                   * n_lights, 0.0)
            rad_out_b += jnp.where(alive, beta[2] * alb_b * contrib_b * leb
                                   * n_lights, 0.0)

            if has_env:
                # env radiance along wi2
                if env_kind == lt.ENV_GRADIENT:
                    dl = jax.lax.rsqrt(jnp.maximum(
                        w2x * w2x + w2y * w2y + w2z * w2z, 1e-30))
                    yy2 = (w2y * dl + 1.0) * 0.5
                    er2 = scal_ref[0] * yy2 + scal_ref[3] * (1.0 - yy2)
                    eg2 = scal_ref[1] * yy2 + scal_ref[4] * (1.0 - yy2)
                    eb2 = scal_ref[2] * yy2 + scal_ref[5] * (1.0 - yy2)
                else:
                    er2 = jnp.full_like(rox, 1.0) * scal_ref[0]
                    eg2 = jnp.full_like(rox, 1.0) * scal_ref[1]
                    eb2 = jnp.full_like(rox, 1.0) * scal_ref[2]
                valid_e = arm_env & ~occ2 & (pdf2 > 0.0)
                contrib_e = jnp.where(valid_e, f2 / jnp.maximum(pdf2, 1e-20), 0.0)
                rad_out_r += jnp.where(alive, beta[0] * alb_r * contrib_e * er2
                                       * n_lights, 0.0)
                rad_out_g += jnp.where(alive, beta[1] * alb_g * contrib_e * eg2
                                       * n_lights, 0.0)
                rad_out_b += jnp.where(alive, beta[2] * alb_b * contrib_e * eb2
                                       * n_lights, 0.0)

            n_rays += 2.0 * jnp.sum(alive.astype(jnp.float32))

        # ---- BSDF sample for next direction (cosine hemisphere) ----
        u_b0 = _u1(seed, pix, smp_id, bounce, smp.DIM_BSDF_UV, 0,
                   rng=rng)
        u_b1 = _u1(seed, pix, smp_id, bounce, smp.DIM_BSDF_UV, 1,
                   rng=rng)
        ux_ = u_b1 * 2.0 - 1.0
        uy_ = u_b0 * 2.0 - 1.0
        ddx, ddy = _concentric_disk(ux_, uy_)
        ddz = jnp.sqrt(jnp.maximum(1.0 - ddx * ddx - ddy * ddy, 0.0))
        wnx = ddx * fx_ + ddy * bx + ddz * nx
        wny = ddx * fy_ + ddy * by + ddz * ny
        wnz = ddx * fz_ + ddy * bz + ddz * nz
        # throughput: f·cos/pdf = albedo; zero-albedo or emissive-only lanes die
        nonzero = (alb_r > 0.0) | (alb_g > 0.0) | (alb_b > 0.0)
        has_lobe = mat_id >= 0
        alive = alive & nonzero & has_lobe & (ddz > 0.0)
        nbr = jnp.where(alive, beta[0] * alb_r, beta[0])
        nbg = jnp.where(alive, beta[1] * alb_g, beta[1])
        nbb = jnp.where(alive, beta[2] * alb_b, beta[2])

        # ---- Russian roulette ----
        if rr_active:
            lum = 0.21267127 * nbr + 0.71515972 * nbg + 0.07216883 * nbb
            q = jnp.maximum(0.05, 1.0 - lum)
            u_rr = _u1(seed, pix, smp_id, bounce,
                       smp.DIM_RUSSIAN_ROULETTE, rng=rng)
            killed = u_rr < q
            alive = alive & ~killed
            scale = jnp.where(alive, 1.0 / jnp.maximum(1.0 - q, 1e-6), 1.0)
            nbr = nbr * scale
            nbg = nbg * scale
            nbb = nbb * scale

        side = jnp.where(wnx * nx + wny * ny + wnz * nz >= 0.0, 1.0, -1.0)
        rad_r[...] = rad_out_r
        rad_g[...] = rad_out_g
        rad_b[...] = rad_out_b
        nox[...] = px + side * nx * SPAWN_EPS
        noy[...] = py + side * ny * SPAWN_EPS
        noz[...] = pz + side * nz * SPAWN_EPS
        ndx[...] = wnx
        ndy[...] = wny
        ndz[...] = wnz
        beta_r_o[...] = nbr
        beta_g_o[...] = nbg
        beta_b_o[...] = nbb
        alive_out[...] = alive.astype(jnp.int32)
        raycnt[...] = jnp.broadcast_to(n_rays / rox.size, rox.shape)


class FusedDiffuseIntegrator:
    """Driver for the fused bounce kernel (scene must pass
    scene_supports_fused)."""

    def __init__(self, scene, interpret=False):
        self.scene = scene
        self.interpret = interpret
        cols, self.counts = trace_pallas.prim_scalars(scene.geom)
        # Column 13 of the scalar bank carries per-prim material ids.
        geom = scene.geom
        mats = np.concatenate([
            np.asarray(geom.sph_mat), np.asarray(geom.quad_mat),
            np.asarray(geom.tri_mat), np.asarray(geom.disk_mat),
        ]).astype(np.float32)
        cols = list(cols)
        cols[13] = jnp.asarray(mats)
        self.params = tuple(cols)
        mt = scene.materials
        self.mats = jnp.concatenate([
            jnp.asarray(mt.albedo)[:, 0, :], jnp.asarray(mt.emission)
        ], axis=1)
        al = scene.area_lights
        n_area = al.count
        if n_area:
            self.lights = jnp.concatenate([
                al.p0[:n_area], al.p1[:n_area], al.p2[:n_area],
                al.emit[:n_area],
            ], axis=1)
        else:
            self.lights = jnp.zeros((1, 12), jnp.float32)
        self.n_area = n_area
        env = scene.env
        self.env_kind = env.kind
        ca = np.asarray(env.color_a) if env.color_a is not None else np.zeros(3)
        cb = np.asarray(env.color_b) if env.color_b is not None else np.zeros(3)
        self.env_colors = np.concatenate([ca, cb]).astype(np.float32)

    def render_samples(self, sampler, pixel_idx, sample_idx, max_depth=5,
                       msaa=2, rr_start=3, return_ray_count=False):
        from ..geometry import camera as cam_mod
        from ..integrators import wavefront

        rng = rng_kind(sampler)
        rays = wavefront.camera_rays(self.scene, sampler, pixel_idx,
                                     sample_idx, msaa)
        n = rays.origin.shape[0]
        rows = -(-n // LANES)
        rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
        pad = rows * LANES - n

        def prep(a, fill):
            a = jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
            return a.reshape(rows, LANES)

        ox = prep(rays.origin[:, 0], 0.0)
        oy = prep(rays.origin[:, 1], 0.0)
        oz = prep(rays.origin[:, 2], 0.0)
        dx = prep(rays.dir[:, 0], 1.0)
        dy = prep(rays.dir[:, 1], 1.0)
        dz = prep(rays.dir[:, 2], 1.0)
        ones = jnp.ones((rows, LANES), jnp.float32)
        alive = prep(jnp.ones(n, jnp.int32), 0)
        pix = prep(pixel_idx.astype(jnp.int32), 0)
        samp = prep(jnp.broadcast_to(jnp.asarray(sample_idx, jnp.int32),
                                     (n,)), 0)
        beta = (ones, ones, ones)
        radiance = (jnp.zeros_like(ones),) * 3
        ray_count = jnp.zeros((), jnp.float32)

        for bounce in range(max_depth):
            out = _bounce_call(
                self.params, self.mats, self.lights,
                jnp.stack([
                    jnp.asarray(sampler.seed).astype(jnp.int32),
                    jnp.asarray(bounce, jnp.int32),
                ]),
                jnp.asarray(self.env_colors),
                ox, oy, oz, dx, dy, dz,
                beta[0], beta[1], beta[2], alive, pix, samp,
                counts=self.counts, n_mats=int(self.mats.shape[0]),
                n_area=self.n_area, env_kind=self.env_kind,
                bounce_is_first=(bounce == 0),
                rr_active=(bounce > rr_start),
                interpret=self.interpret, rng=rng,
            )
            (rr_, rg_, rb_, ox, oy, oz, dx, dy, dz,
             br_, bg_, bb_, alive, cnt) = out
            radiance = (radiance[0] + rr_, radiance[1] + rg_,
                        radiance[2] + rb_)
            beta = (br_, bg_, bb_)
            # Each tile's lanes all hold tile_rays/tile_size; summing over
            # every lane recovers the total traced-ray count.
            ray_count = ray_count + jnp.sum(cnt)

        rad = jnp.stack(
            [radiance[0].reshape(-1)[:n], radiance[1].reshape(-1)[:n],
             radiance[2].reshape(-1)[:n]], axis=-1,
        )
        if return_ray_count:
            return rad, ray_count
        return rad


@functools.partial(
    jax.jit,
    static_argnames=("counts", "n_mats", "n_area", "env_kind",
                     "bounce_is_first", "rr_active", "interpret", "rng"),
)
def _bounce_call(params, mats, lights, ints, scal,
                 ox, oy, oz, dx, dy, dz, br, bg, bb, alive, pix, samp,
                 counts, n_mats, n_area, env_kind, bounce_is_first,
                 rr_active, interpret, rng="pcg"):
    # params: tuple of 16 1-D SMEM prim columns.
    rows = ox.shape[0]
    grid = (rows // BLOCK_ROWS,)
    blk = lambda: pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _bounce_kernel, counts=counts, n_mats=n_mats, n_area=n_area,
        env_kind=env_kind, bounce_is_first=bounce_is_first,
        rr_active=rr_active, rng=rng,
    )
    n_out = 14
    shp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishp = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem()] * 16 + [smem(), smem(), smem(), smem()]
        + [blk() for _ in range(12)],
        out_specs=tuple([blk()] * n_out),
        out_shape=(
            shp, shp, shp,  # radiance delta
            shp, shp, shp,  # next origin
            shp, shp, shp,  # next dir
            shp, shp, shp,  # beta
            ishp,  # alive
            shp,  # ray count (per-lane avg encoding)
        ),
        interpret=interpret,
    )(*params, mats, lights, ints, scal, ox, oy, oz, dx, dy, dz, br, bg, bb,
      alive, pix, samp)
