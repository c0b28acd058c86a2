"""Pallas ray-tracing kernels over typed primitive tables.

The jnp brute-force sweep (shapes/intersect.py) materializes [N, K]
intermediates in HBM; these kernels keep a ray tile resident in VMEM,
stream the (tiny) primitive tables from SMEM scalars, and loop over
primitives on the VPU — one HBM read of the rays and one write of
(t, prim_index) per tile. This is the closest-hit / any-hit pair that
replaces the reference's recursive BVH walk for table scenes
(reference tlas/src/bvh.rs:77-113); the two-level BVH kernel for meshes
builds on the same structure.

Ray layout: component arrays reshaped to [rows, 128] (lanes = rays).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import ray as ray_mod
from ..shapes.tables import GeometryTables
from . import mesh_pallas

LANES = 128
# Above this many triangles the table sweep hands them to the BVH kernel.
# Per-family prim count above which the packet-BVH kernel takes over.
# Measured on v5e ('everything', 3400 prims): the flat VPU sweep beats the
# tile-uniform packet BVH ~3x on BOTH coherent and incoherent 1M-ray
# batches (11.5 vs 3.7 Mrays/s) — a 4096-lane tile walks the union of its
# rays' subtrees, which approaches the whole tree, while brute force is
# pure VPU throughput. SMEM bank at 4096 prims = 16*4*4096 = 256 KB.
BVH_THRESHOLD = 4096
# Per-family prim count above which the treelet MXU-gather tracer
# (accel/treelet.py) takes over from the flat sweep. Crossover measured on
# v5e: flat sweep ~20 Mrays/s at 1k prims and falls linearly; the treelet
# tracer holds 10-30 Mrays/s nearly independent of prim count.
TREELET_THRESHOLD = 1024
BLOCK_ROWS = 64  # 64 x 128 = 8192 rays per tile
T_MIN = ray_mod.T_MIN
BIG = 3.0e38


def _pad_rows(n):
    rows = -(-n // LANES)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    return rows


def prim_scalars(geom: GeometryTables, include=(True, True, True, True),
                 subsets=None, with_ids=False):
    """Flatten primitive tables to a single f32 scalar bank [P, 16]:
    per-prim row = type-specific params. Order: spheres, quads, [tris,]
    disks. Global prim ids always follow the sphere/quad/tri/disk
    convention of shapes/intersect.py; BVH-managed families are excluded
    from the bank (SMEM is ~1MB) and the kernel adjusts row offsets.

    with_ids=True (PallasTracer's bank): column 15 of every row carries
    the GLOBAL prim id (exact in f32 below 2^24), the returned counts are
    bank row counts per family, and `subsets` may give per-family index
    arrays selecting a non-contiguous slice of a family into the bank —
    the flat-sweep side of the big/small primitive partition (the dense
    remainder goes to a treelet tracer with an id map)."""
    sph_c = np.asarray(geom.sph_center)
    sph_r = np.asarray(geom.sph_radius)
    q_o = np.asarray(geom.quad_origin)
    q_u = np.asarray(geom.quad_u)
    q_v = np.asarray(geom.quad_v)
    t_p0 = np.asarray(geom.tri_p0)
    t_p1 = np.asarray(geom.tri_p1)
    t_p2 = np.asarray(geom.tri_p2)
    d_c = np.asarray(geom.disk_center)
    d_n = np.asarray(geom.disk_normal)
    d_r = np.asarray(geom.disk_radial)

    fam = (sph_c.shape[0], q_o.shape[0], t_p0.shape[0], d_c.shape[0])
    base = (0, fam[0], fam[0] + fam[1], fam[0] + fam[1] + fam[2])
    if subsets is None:
        subsets = (None, None, None, None)
    sel = [
        (np.arange(fam[i]) if subsets[i] is None
         else np.asarray(subsets[i], np.int64))
        if include[i] else np.zeros(0, np.int64)
        for i in range(4)
    ]
    if with_ids:
        assert sum(fam) < (1 << 24), "f32 id column overflows at 2^24 prims"

    rows = []
    for c, r, gid in zip(sph_c[sel[0]], sph_r[sel[0]], base[0] + sel[0]):
        rows.append([*c, r] + [0.0] * 11 + [float(gid)])
    for o, u, v, gid in zip(q_o[sel[1]], q_u[sel[1]], q_v[sel[1]],
                            base[1] + sel[1]):
        n = np.cross(u, v)
        n2 = max(float((n * n).sum()), 1e-30)
        rows.append([*o, *u, *v, *n, n2] + [0.0] * 2 + [float(gid)])
    for p0, p1, p2, gid in zip(t_p0[sel[2]], t_p1[sel[2]], t_p2[sel[2]],
                               base[2] + sel[2]):
        n = np.cross(p0 - p1, p2 - p1)
        ln = np.linalg.norm(n)
        # Degenerate (incl. padding dummies): zero normal -> denom == 0
        # -> the plane test can never pass.
        n = n / ln if ln > 0 else np.zeros(3)
        rows.append([*p0, *p1, *p2, *n] + [0.0] * 3 + [float(gid)])
    for c, n, r, gid in zip(d_c[sel[3]], d_n[sel[3]], d_r[sel[3]],
                            base[3] + sel[3]):
        r2 = float((r * r).sum())
        rows.append([*c, *n, r2] + [0.0] * 8 + [float(gid)])
    if not rows:
        rows.append([0.0] * 15 + [-1.0])
    bank = np.asarray(rows, np.float32)
    if not with_ids:
        bank = bank.copy()
        bank[:, 15] = 0.0
    # 1-D component columns: 2-D SMEM tables pad the minor dim to 128 lanes
    # (8x waste); sixteen 1-D arrays don't.
    cols = tuple(jnp.asarray(np.ascontiguousarray(bank[:, j]))
                 for j in range(16))
    counts = (tuple(len(s) for s in sel) if with_ids else fam)
    return cols, counts


def _trace_kernel(*refs, counts, any_hit):
    """One ray tile vs every primitive in the bank. refs: 16 SMEM prim
    columns + 7 ray planes + 2 outputs. counts = bank rows per family
    (families handled by treelet tracers, or the dense side of a big/small
    partition, have 0 or subset-sized rows); winner ids come from the
    bank's id column (col 15), so bank rows may be any subset of a
    family."""
    cols = refs[:16]
    ox, oy, oz, dx, dy, dz, tmax = refs[16:23]
    t_out, idx_out = refs[23:25]
    n_sph, n_quad, n_tri, n_disk = counts
    # All-dead tile early-out: lanes killed upstream carry t_max <= 0
    # (dead rays / RR kills are spatially coherent), so whole 64x128 tiles
    # skip the primitive sweep on deep bounces.
    t_out[...] = jnp.full(ox.shape, jnp.inf, jnp.float32)
    idx_out[...] = jnp.full(ox.shape, -1, jnp.int32)

    @pl.when(jnp.any(tmax[...] > 0.0))
    def _run_tile():
        rox, roy, roz = ox[...], oy[...], oz[...]
        rdx, rdy, rdz = dx[...], dy[...], dz[...]
        t_max = tmax[...]

        t_best = jnp.full(rox.shape, BIG, jnp.float32)
        idx_best = jnp.full(rox.shape, -1, jnp.int32)

        def consider(t, ok, pid, carry):
            t_best, idx_best = carry
            t = jnp.where(ok & (t >= T_MIN) & (t < t_max), t, BIG)
            closer = t < t_best
            return jnp.where(closer, t, t_best), jnp.where(closer, pid, idx_best)

        def gid(row):
            return cols[15][row].astype(jnp.int32)

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
            return consider(t, ok, gid(i), carry)

        def quad_body(i, carry):
            p = lambda j: cols[j][sph_rows + i]
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
            return consider(t, ok, gid(sph_rows + i), carry)

        # Bank row offsets per family (counts are bank rows, not full
        # family sizes — treelet-managed families contribute 0 or a
        # subset's worth of rows).
        sph_rows = n_sph
        quad_rows = n_quad
        tri_rows = n_tri

        def tri_body(i, carry):
            p = lambda j: cols[j][sph_rows + quad_rows + i]
            p0x, p0y, p0z = p(0), p(1), p(2)
            p1x, p1y, p1z = p(3), p(4), p(5)
            p2x, p2y, p2z = p(6), p(7), p(8)
            nx, ny, nz = p(9), p(10), p(11)
            denom = rdx * nx + rdy * ny + rdz * nz
            denom_s = jnp.where(denom == 0.0, 1.0, denom)
            t = ((p0x - rox) * nx + (p0y - roy) * ny + (p0z - roz) * nz) / denom_s
            hx = rox + t * rdx
            hy = roy + t * rdy
            hz = roz + t * rdz
            # signed areas
            def edge(ax, ay, az, bx, by, bz):
                ex, ey, ez = hx - ax, hy - ay, hz - az
                fx, fy, fz = hx - bx, hy - by, hz - bz
                cx = ey * fz - ez * fy
                cy = ez * fx - ex * fz
                cz = ex * fy - ey * fx
                return cx * nx + cy * ny + cz * nz
            b2 = edge(p0x, p0y, p0z, p1x, p1y, p1z)
            b0 = edge(p1x, p1y, p1z, p2x, p2y, p2z)
            b1 = edge(p2x, p2y, p2z, p0x, p0y, p0z)
            inside = ((b0 > 0) & (b1 > 0) & (b2 > 0)) | (
                (b0 < 0) & (b1 < 0) & (b2 < 0)
            )
            ok = (denom != 0.0) & inside
            return consider(t, ok, gid(sph_rows + quad_rows + i), carry)

        def disk_body(i, carry):
            p = lambda j: cols[j][sph_rows + quad_rows + tri_rows + i]
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
            return consider(
                t, ok, gid(sph_rows + quad_rows + tri_rows + i), carry)

        carry = (t_best, idx_best)
        if n_sph:
            carry = jax.lax.fori_loop(0, n_sph, sphere_body, carry)
        if n_quad:
            carry = jax.lax.fori_loop(0, n_quad, quad_body, carry)
        if n_tri:
            carry = jax.lax.fori_loop(0, n_tri, tri_body, carry)
        if n_disk:
            carry = jax.lax.fori_loop(0, n_disk, disk_body, carry)
        t_best, idx_best = carry

        miss = t_best >= BIG
        t_out[...] = jnp.where(miss, jnp.inf, t_best)
        idx_out[...] = jnp.where(miss, -1, idx_best)


@functools.partial(jax.jit, static_argnames=("counts", "interpret"))
def _trace_padded(params, ox, oy, oz, dx, dy, dz, tmax, counts,
                  interpret=False):
    # params: tuple of 16 1-D SMEM columns.
    rows = ox.shape[0]
    grid = (rows // BLOCK_ROWS,)
    blk = lambda: pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_trace_kernel, counts=counts, any_hit=False)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 16 + [
            blk(), blk(), blk(), blk(), blk(), blk(), blk(),
        ],
        out_specs=(blk(), blk()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(*params, ox, oy, oz, dx, dy, dz, tmax)
    return t, idx


# Big/small partition bounds: at most this many "big" prims stay in the
# flat bank (the sweep is linear per ray — 256 prims still run >100
# Mrays/s), and a prim counts as big when its area exceeds this multiple
# of the family's median (room shells / floors are ~1e4-1e6x a dense
# mesh's triangle).
PARTITION_MAX_FLAT = 256
PARTITION_AREA_FACTOR = 32.0


def _partition_big(area, thresh):
    """Split a family by area into (big_ids, small_ids) or (None, None)
    when a partition wouldn't pay: the big side must be small enough for
    the flat sweep and the small side big enough to want a treelet.

    When more prims clear the area factor than the flat bank holds, keep
    the LARGEST PARTITION_MAX_FLAT — aborting instead would push the
    room-shell walls (hit by every ray) back into the treelet walk
    (measured: baking the interior's 288 chair tris tipped n_big past the
    cap and silently undid the whole §12 partition win)."""
    n = area.shape[0]
    pos = area[area > 0]
    if pos.size == 0:
        return None, None
    med = float(np.median(pos))
    if med <= 0:
        return None, None
    big = area > PARTITION_AREA_FACTOR * med
    n_big = int(big.sum())
    if n_big > PARTITION_MAX_FLAT:
        order = np.argsort(area)[::-1][:PARTITION_MAX_FLAT]
        big = np.zeros(n, bool)
        big[order] = True
        n_big = PARTITION_MAX_FLAT
    if n_big == 0 or (n - n_big) <= thresh:
        return None, None
    return np.nonzero(big)[0], np.nonzero(~big)[0]


class PallasTracer:
    """Closest-hit / any-hit queries against a GeometryTables snapshot.

    Families above TREELET_THRESHOLD are handled by the treelet MXU-gather
    tracer (accel/treelet.py); small tables go through the flat prim loop.

    Mixed-scale families (a dense mesh + a few room-sized prims, e.g. the
    PBRT interior's walls vs its PLY meshes) are PARTITIONED by area: the
    few big prims sweep in the flat bank (linear, cheap), the dense
    remainder gets a treelet tracer whose chunk boxes stay tight around
    the mesh — rays that never approach the mesh skip it at the chunk
    gate instead of paying treelet rounds for every wall hit. Winner ids
    stay global on both sides (bank id column / treelet id map)."""

    def __init__(self, geom: GeometryTables, interpret: bool = False,
                 bvh_threshold: int | None = None):
        from . import treelet as tl

        self.geom = geom
        self.interpret = interpret
        thresh = TREELET_THRESHOLD if bvh_threshold is None else bvh_threshold
        n_sph = int(np.asarray(geom.sph_center).shape[0])
        n_quad = int(np.asarray(geom.quad_origin).shape[0])
        n_tri = int(np.asarray(geom.tri_p0).shape[0])
        n_disk = int(np.asarray(geom.disk_center).shape[0])
        base_sph = 0
        base_quad = n_sph
        base_tri = n_sph + n_quad
        base_disk = n_sph + n_quad + n_tri
        self.bvhs = []
        include = [True, True, True, True]
        subsets = [None, None, None, None]
        if n_sph > thresh:
            self.bvhs.append(tl.sphere_tracer(
                geom.sph_center, geom.sph_radius, base_sph,
                interpret=interpret))
            include[0] = False
        if n_quad > thresh:
            u = np.asarray(geom.quad_u)
            v = np.asarray(geom.quad_v)
            area = np.linalg.norm(np.cross(u, v), axis=1)
            big, small = _partition_big(area, thresh)
            if big is None:
                self.bvhs.append(tl.quad_tracer(
                    geom.quad_origin, geom.quad_u, geom.quad_v, base_quad,
                    interpret=interpret))
                include[1] = False
            else:
                o = np.asarray(geom.quad_origin)
                self.bvhs.append(tl.quad_tracer(
                    o[small], u[small], v[small], base_quad + small,
                    interpret=interpret))
                subsets[1] = big
        if n_tri > thresh:
            p0 = np.asarray(geom.tri_p0)
            p1 = np.asarray(geom.tri_p1)
            p2 = np.asarray(geom.tri_p2)
            area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1)
            big, small = _partition_big(area, thresh)
            if big is None:
                self.bvhs.append(tl.tri_tracer(
                    p0, p1, p2, base_tri, interpret=interpret))
                include[2] = False
            else:
                self.bvhs.append(tl.tri_tracer(
                    p0[small], p1[small], p2[small], base_tri + small,
                    interpret=interpret))
                subsets[2] = big
        if n_disk > thresh:
            self.bvhs.append(tl.disk_tracer(
                geom.disk_center, geom.disk_normal, geom.disk_radial,
                base_disk, interpret=interpret))
            include[3] = False
        self.do_types = tuple(include)
        # Kept for tests/back-compat: the triangle tracer if one exists.
        self.mesh = next(
            (b for b in self.bvhs if b.kind == tl.KIND_TRI), None
        )
        self.params, self.counts = prim_scalars(
            geom, include=tuple(include), subsets=tuple(subsets),
            with_ids=True)
        self.flat_rows = sum(self.counts)

    def _components(self, rays: ray_mod.RayBatch):
        n = rays.origin.shape[0]
        rows = _pad_rows(n)
        pad = rows * LANES - n

        def prep(a, fill):
            a = jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
            return a.reshape(rows, LANES)

        comps = [prep(rays.origin[:, i], 0.0) for i in range(3)]
        comps += [prep(rays.dir[:, i], 1.0) for i in range(3)]
        comps.append(prep(rays.t_max, -1.0))
        return comps, n

    def trace(self, rays: ray_mod.RayBatch, any_hit=False, mode=None):
        """Returns (t [N], prim_idx [N]) with t=inf, idx=-1 on miss.

        mode: treelet kernel selection forwarded to TreeletTracer.trace
        (None/'onehot' per-lane gathers, 'rowdense' row-shared dense)."""
        comps, n = self._components(rays)
        if self.flat_rows:
            t, idx = _trace_padded(
                self.params, *comps, counts=self.counts,
                interpret=self.interpret,
            )
            t, idx = t.reshape(-1)[:n], idx.reshape(-1)[:n]
        else:
            t = jnp.full(n, jnp.inf, jnp.float32)
            idx = jnp.full(n, -1, jnp.int32)
        for bvh in self.bvhs:
            t2, idx2 = bvh.trace(rays, any_hit=any_hit, mode=mode)
            closer = t2 < t
            t = jnp.where(closer, t2, t)
            idx = jnp.where(closer, idx2, idx)
        return t, idx

    def occluded(self, rays: ray_mod.RayBatch, mode=None):
        t, _ = self.trace(rays, any_hit=True, mode=mode)
        return jnp.isfinite(t)
