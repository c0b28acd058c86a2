"""Treelet wavefront tracer: BVH traversal re-shaped for the MXU.

The reference traverses a binary BVH per ray with a node stack
(reference shape/src/blas.rs:422-476). Per-ray pointer chasing is the worst
possible shape for a TPU: every step is a serialized scalar load + cross-lane
reduce (the packet kernel in mesh_pallas.py measures ~500 cycles *per node*).
This module replaces traversal with dense, coherence-oblivious compute:

1. The host cuts the SAH BVH into *treelets* of <= 64 primitives (the BVH
   leaves at max_leaf=64) and flattens each family's geometry into a
   field-major matrix [fields x 64, T] (row f*64+j = field f of slot j).
2. Phase 1 (device): every ray slab-tests every treelet AABB at once —
   a [T, 1024] elementwise pass, rays along lanes. Each (ray, treelet)
   entry becomes a sort key: the t_enter float with its low mantissa bits
   replaced by the treelet id (distinct keys, int-comparable, and a
   *conservative lower bound* of t_enter, so ordering/termination by key
   is exact).
3. Rounds: each ray picks its nearest untested treelet (a sublane min),
   builds a one-hot column, and the treelet's geometry is gathered through
   the MXU: three bf16 matmuls against hi/mid/lo bit-splits of the f32
   table reconstruct the gathered rows *bit-exactly* (each one-hot row has
   a single 1.0, so every MXU product is a single bf16 value and the f32
   sum of the three splits is the original float). The 64 primitives are
   then intersected densely at full VPU utilization, [64 prims x 1024 rays].
   A ray is resolved when its best hit is closer than every untested
   treelet's key; the block loop ends when all 1024 lanes resolve.

The result is a traversal whose inner loop is matmul + elementwise work —
no gathers, no divergence, the same cost for coherent and incoherent rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import ray as ray_mod
from . import bvh as bvh_mod

RAYS = 1024  # rays per batch row (lane dimension)
SUBROWS = 8  # batch rows per kernel block (sublane-divisibility)
BLOCK_RAYS = RAYS * SUBROWS
TREELET = 64  # primitive slots per treelet
CHUNK = 128  # compacted gather width (columns per treelet group)
T_MIN = ray_mod.T_MIN
BIG = 3.0e38
INT_MAX = np.int32(2**31 - 1)

KIND_TRI, KIND_QUAD, KIND_SPHERE, KIND_DISK = 0, 1, 2, 3
# Field counts per primitive kind (field-major blocks of TREELET rows).
N_FIELDS = {KIND_TRI: 13, KIND_QUAD: 13, KIND_SPHERE: 5, KIND_DISK: 8}


def _split3(x: np.ndarray):
    """f32 -> 3 bf16 planes whose f32 sum reconstructs x bit-exactly
    (8+8+8 mantissa bits cover f32's 24; verified exact on TPU)."""
    import ml_dtypes

    x = np.asarray(x, np.float32)
    hi = x.astype(ml_dtypes.bfloat16)
    r1 = x - hi.astype(np.float32)
    mid = r1.astype(ml_dtypes.bfloat16)
    r2 = r1 - mid.astype(np.float32)
    lo = r2.astype(ml_dtypes.bfloat16)
    return hi, mid, lo


def _tri_fields(p0, p1, p2, gid):
    n = np.cross(p0 - p1, p2 - p1)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(ln > 0, n / np.maximum(ln, 1e-30), 0.0)
    return np.concatenate([p0, p1, p2, n, gid[:, None]], 1).astype(np.float32)


def _quad_fields(o, eu, ev, gid):
    n = np.cross(eu, ev)
    return np.concatenate([o, eu, ev, n, gid[:, None]], 1).astype(np.float32)


def _sphere_fields(c, r, gid):
    return np.concatenate([c, r[:, None], gid[:, None]], 1).astype(np.float32)


def _disk_fields(c, n, radial, gid):
    r2 = (radial * radial).sum(1, keepdims=True)
    return np.concatenate([c, n, r2, gid[:, None]], 1).astype(np.float32)


FIELD_BUILDERS = {
    KIND_TRI: _tri_fields,
    KIND_QUAD: _quad_fields,
    KIND_SPHERE: _sphere_fields,
    KIND_DISK: _disk_fields,
}


def build_treelets(kind, fields, bbox_lo, bbox_hi, treelet=TREELET,
                   max_t=16384):
    """Host build: SAH-cut treelets + chunked field-major gather tables.

    fields: [P, F] per-prim field rows (from FIELD_BUILDERS, gid included).
    Returns (boxes [T_pad, 8] f32 — cols xlo,ylo,zlo,xhi,yhi,zhi,0,0 with
    treelets along sublanes; table_splits 3 x [n_chunks, F*treelet, CHUNK]
    bf16 (HBM-resident, DMA'd per visited chunk); n_chunks; T_count).
    """
    fields = np.asarray(fields, np.float32)
    p, nf = fields.shape
    assert nf == N_FIELDS[kind]
    bvh = bvh_mod.build_bvh(bbox_lo, bbox_hi, max_leaf=treelet)
    leaf_ids = np.where(bvh.is_leaf > 0)[0]
    t_count = len(leaf_ids)
    assert t_count <= max_t, f"{t_count} treelets exceeds cap {max_t}"
    # Leaf order is the builder's DFS emit order == spatial locality, so
    # consecutive treelets land in the same chunk.
    t_pad = max(CHUNK, -(-t_count // CHUNK) * CHUNK)
    n_chunks = t_pad // CHUNK

    tbl = np.zeros((nf * treelet, t_pad), np.float32)
    boxes = np.zeros((t_pad, 8), np.float32)
    boxes[:, 0:3] = BIG
    boxes[:, 3:6] = -BIG
    order = bvh.prim_order
    for col, node in enumerate(leaf_ids):
        f, c = bvh.first[node], bvh.count[node]
        rows = fields[order[f:f + c]]  # [c, F]
        # field-major: row k*treelet + j = field k of slot j
        tbl[:, col].reshape(nf, treelet)[:, :c] = rows.T
        boxes[col, 0:3] = bvh.bbox_min[node]
        boxes[col, 3:6] = bvh.bbox_max[node]
    hi, mid, lo = _split3(tbl)

    def chunked(a):
        # [F*treelet, t_pad] -> [n_chunks, F*treelet, CHUNK]
        a = np.asarray(a)
        return jnp.asarray(
            np.ascontiguousarray(
                a.reshape(a.shape[0], n_chunks, CHUNK).transpose(1, 0, 2)))

    return (
        jnp.asarray(boxes),
        (chunked(hi), chunked(mid), chunked(lo)),
        n_chunks, t_count,
    )


# ---------------------------------------------------------------------------
# Primitive tests, operand shapes [TREELET, RAYS] (prims x rays) with the
# ray components broadcast from [1, RAYS]. All component-form; same math as
# accel/mesh_pallas.py / the reference shape/src/simple.rs.
# ---------------------------------------------------------------------------

def _test_prims(kind, g, nf, rox, roy, roz, rdx, rdy, rdz, t_max):
    """g: gathered [nf*TREELET, RAYS] f32. Returns (t [64,R], ok [64,R],
    gid [64,R] f32)."""
    f = lambda k: g[k * TREELET:(k + 1) * TREELET]
    if kind == KIND_SPHERE:
        cx, cy, cz, r = f(0), f(1), f(2), f(3)
        gid = f(4)
        fx, fy, fz = rox - cx, roy - cy, roz - cz
        a = rdx * rdx + rdy * rdy + rdz * rdz
        b_pr = -(fx * rdx + fy * rdy + fz * rdz)
        inv_a = 1.0 / jnp.maximum(a, 1e-30)
        mx = fx + b_pr * inv_a * rdx
        my = fy + b_pr * inv_a * rdy
        mz = fz + b_pr * inv_a * rdz
        delta = r * r - (mx * mx + my * my + mz * mz)
        cc = fx * fx + fy * fy + fz * fz - r * r
        q = b_pr + jnp.where(b_pr >= 0.0, 1.0, -1.0) * jnp.sqrt(
            jnp.maximum(delta * a, 0.0))
        q_s = jnp.where(q == 0.0, 1.0, q)
        t0 = cc / q_s
        t1 = q * inv_a
        t_lo_ = jnp.minimum(t0, t1)
        t_hi_ = jnp.maximum(t0, t1)
        ok0 = (delta >= 0.0) & (q != 0.0) & (r > 0.0)
        lo_ok = ok0 & (t_lo_ >= T_MIN) & (t_lo_ < t_max)
        t = jnp.where(lo_ok, t_lo_, t_hi_)
        ok = ok0 & (t >= T_MIN) & (t < t_max)
        return t, ok, gid
    if kind == KIND_QUAD:
        ox_, oy_, oz_ = f(0), f(1), f(2)
        ux, uy, uz = f(3), f(4), f(5)
        vx, vy, vz = f(6), f(7), f(8)
        nx, ny, nz = f(9), f(10), f(11)
        gid = f(12)
        n2 = jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((ox_ - rox) * nx + (oy_ - roy) * ny + (oz_ - roz) * nz) / denom_s
        hx = rox + t * rdx - ox_
        hy = roy + t * rdy - oy_
        hz = roz + t * rdz - oz_
        cx = hy * vz - hz * vy
        cy = hz * vx - hx * vz
        cz = hx * vy - hy * vx
        uu = (cx * nx + cy * ny + cz * nz) / n2
        cx = uy * hz - uz * hy
        cy = uz * hx - ux * hz
        cz = ux * hy - uy * hx
        vv = (cx * nx + cy * ny + cz * nz) / n2
        ok = ((denom != 0.0) & (uu >= 0.0) & (uu <= 1.0)
              & (vv >= 0.0) & (vv <= 1.0) & (t >= T_MIN) & (t < t_max))
        return t, ok, gid
    if kind == KIND_DISK:
        cx_, cy_, cz_ = f(0), f(1), f(2)
        nx, ny, nz = f(3), f(4), f(5)
        r2 = f(6)
        gid = f(7)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((cx_ - rox) * nx + (cy_ - roy) * ny + (cz_ - roz) * nz) / denom_s
        hx = rox + t * rdx - cx_
        hy = roy + t * rdy - cy_
        hz = roz + t * rdz - cz_
        ok = ((denom != 0.0) & (hx * hx + hy * hy + hz * hz <= r2)
              & (t >= T_MIN) & (t < t_max))
        return t, ok, gid
    # KIND_TRI
    p0x, p0y, p0z = f(0), f(1), f(2)
    p1x, p1y, p1z = f(3), f(4), f(5)
    p2x, p2y, p2z = f(6), f(7), f(8)
    nx, ny, nz = f(9), f(10), f(11)
    gid = f(12)
    denom = rdx * nx + rdy * ny + rdz * nz
    denom_s = jnp.where(denom == 0.0, 1.0, denom)
    t = ((p0x - rox) * nx + (p0y - roy) * ny + (p0z - roz) * nz) / denom_s
    hx = rox + t * rdx
    hy = roy + t * rdy
    hz = roz + t * rdz

    def edge(ax, ay, az, bx, by, bz):
        ex, ey, ez = hx - ax, hy - ay, hz - az
        gx, gy, gz = hx - bx, hy - by, hz - bz
        cx = ey * gz - ez * gy
        cy = ez * gx - ex * gz
        cz = ex * gy - ey * gx
        return cx * nx + cy * ny + cz * nz

    b2 = edge(p0x, p0y, p0z, p1x, p1y, p1z)
    b0 = edge(p1x, p1y, p1z, p2x, p2y, p2z)
    b1 = edge(p2x, p2y, p2z, p0x, p0y, p0z)
    inside = ((b0 > 0) & (b1 > 0) & (b2 > 0)) | (
        (b0 < 0) & (b1 < 0) & (b2 < 0))
    ok = (denom != 0.0) & inside & (t >= T_MIN) & (t < t_max)
    return t, ok, gid


LOCAL_BITS = 7  # log2(CHUNK): low key bits carry the in-chunk treelet id
LOCAL_MASK = np.int32((1 << LOCAL_BITS) - 1)


def _treelet_kernel(boxes_ref, hi_ref, mid_ref, lo_ref,
                    ox, oy, oz, dx, dy, dz, tmax,
                    t_out, idx_out, tc_hi, tc_mid, tc_lo, sems, *,
                    kind, n_chunks, t_count, any_hit):
    # Blocks are [SUBROWS, RAYS]; each sublane row is an independent batch
    # of RAYS rays (TPU block shapes must be sublane-divisible).
    for r in range(SUBROWS):
        _treelet_row(boxes_ref, hi_ref, mid_ref, lo_ref,
                     ox, oy, oz, dx, dy, dz, tmax, t_out, idx_out,
                     tc_hi, tc_mid, tc_lo, sems,
                     r, kind=kind, n_chunks=n_chunks, t_count=t_count,
                     any_hit=any_hit)


def _treelet_row(boxes_ref, hi_ref, mid_ref, lo_ref,
                 ox, oy, oz, dx, dy, dz, tmax,
                 t_out, idx_out, tc_hi, tc_mid, tc_lo, sems,
                 r, *, kind, n_chunks, t_count, any_hit):
    """Trace 1024 rays (row r of the block) against all chunks.

    Phase 1 computes, per chunk, each lane's min traversal key (a float
    t_enter lower bound with the in-chunk treelet id in the low 7 bits).
    The outer loop walks chunks in DFS (spatial) order, skipping any chunk
    whose best key cannot beat the lane's current hit; a visited chunk's
    three table splits are DMA'd from HBM into VMEM scratch, then the inner
    loop lets every lane pull its treelets strictly in t-lower-bound order
    (one MXU one-hot gather per round) until no lane can improve.
    """
    nf = N_FIELDS[kind]
    rox, roy, roz = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]  # [1, RAYS]
    rdx, rdy, rdz = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]
    t_max = tmax[r:r+1, :]
    inv_x = 1.0 / jnp.where(rdx == 0.0, 1e-30, rdx)
    inv_y = 1.0 / jnp.where(rdy == 0.0, 1e-30, rdy)
    inv_z = 1.0 / jnp.where(rdz == 0.0, 1e-30, rdz)

    def chunk_keys(boxes, base):
        """Slab-test one chunk's boxes -> int32 traversal keys [C, RAYS].

        boxes: [CHUNK, 8] (xlo,ylo,zlo,xhi,yhi,zhi,_,_). Key = bits of the
        clipped t_enter with the low LOCAL_BITS replaced by the in-chunk
        treelet id — int-comparable, distinct, and a conservative *lower*
        bound of t_enter (clearing mantissa bits only decreases the float).
        """
        tx0 = (boxes[:, 0:1] - rox) * inv_x  # [C, RAYS]
        tx1 = (boxes[:, 3:4] - rox) * inv_x
        ty0 = (boxes[:, 1:2] - roy) * inv_y
        ty1 = (boxes[:, 4:5] - roy) * inv_y
        tz0 = (boxes[:, 2:3] - roz) * inv_z
        tz1 = (boxes[:, 5:6] - roz) * inv_z
        t_enter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1))
        t_exit = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1))
        lid = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RAYS), 0)
        # Padding columns (bbox +BIG/-BIG) can pass the slab test through
        # f32 overflow (inf*x) — mask them out explicitly.
        hit_box = ((t_enter <= t_exit) & (t_exit >= T_MIN)
                   & (t_enter < t_max) & (base + lid < t_count))
        te = jnp.clip(t_enter, 0.0, BIG)
        kbits = jax.lax.bitcast_convert_type(te, jnp.int32)
        return jnp.where(hit_box, (kbits & ~LOCAL_MASK) | lid, INT_MAX)

    # ---- phase 1: per-chunk, per-lane min key (chunk skip bounds) ----
    mins = []
    for kk in range(n_chunks):
        keys_kk = chunk_keys(boxes_ref[kk*CHUNK:(kk+1)*CHUNK, :], kk * CHUNK)
        mins.append(jnp.min(keys_kk, axis=0, keepdims=True))
    chunkmins = jnp.concatenate(mins, axis=0) if n_chunks > 1 else mins[0]

    t_best0 = jnp.full((1, RAYS), BIG, jnp.float32)
    idx0 = jnp.full((1, RAYS), -1, jnp.int32)
    crow = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, RAYS), 0)

    def lane_alive(kmin, t_best, idx_best):
        t_lb = jax.lax.bitcast_convert_type(kmin & ~LOCAL_MASK, jnp.float32)
        alive = (kmin != INT_MAX) & (t_lb < t_best)
        if any_hit:
            alive = alive & (idx_best < 0)
        return alive

    # bf16 one-hot matmuls are exact here: each one-hot column selects a
    # single bf16 table entry (a sum with one nonzero term), so the
    # f32-accumulated result IS that entry, and the f32 sum of the three
    # splits reconstructs the original f32 bit-exactly. precision=DEFAULT
    # overrides the package-wide "highest" matmul precision (one-pass bf16
    # is already exact); Mosaic requires the 32-bit accumulator.
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def resolve(alive, g, t_best, idx_best):
        """Dense prim test of the gathered treelet + best-hit update."""
        t_c, ok, gid = _test_prims(
            kind, g, nf, rox, roy, roz, rdx, rdy, rdz, t_max)
        t_c = jnp.where(ok & alive, t_c, BIG)
        tmin = jnp.min(t_c, axis=0, keepdims=True)  # [1, RAYS]
        gid_i = gid.astype(jnp.int32)
        gid_sel = jnp.min(
            jnp.where(t_c == tmin, gid_i, INT_MAX), axis=0, keepdims=True)
        closer = tmin < t_best
        t_best = jnp.where(closer, tmin, t_best)
        idx_best = jnp.where(closer, gid_sel, idx_best)
        return t_best, idx_best

    def outer_cond(state):
        k, t_best, idx_best = state
        rem = jnp.min(jnp.where(crow >= k, chunkmins, INT_MAX),
                      axis=0, keepdims=True)
        alive = lane_alive(rem, t_best, idx_best)
        return jnp.sum(alive.astype(jnp.float32)) > 0.0

    def outer_body(state):
        k, t_best, idx_best = state
        this = jnp.min(jnp.where(crow == k, chunkmins, INT_MAX),
                       axis=0, keepdims=True)
        want = lane_alive(this, t_best, idx_best)
        skip = jnp.sum(want.astype(jnp.float32)) == 0.0

        def visit(t_best, idx_best):
            # DMA this chunk's three table splits HBM -> VMEM scratch.
            cp_hi = pltpu.make_async_copy(hi_ref.at[k], tc_hi, sems.at[0])
            cp_mid = pltpu.make_async_copy(mid_ref.at[k], tc_mid, sems.at[1])
            cp_lo = pltpu.make_async_copy(lo_ref.at[k], tc_lo, sems.at[2])
            cp_hi.start()
            cp_mid.start()
            cp_lo.start()
            keys_c = chunk_keys(boxes_ref[pl.ds(k * CHUNK, CHUNK), :],
                                k * CHUNK)
            cp_hi.wait()
            cp_mid.wait()
            cp_lo.wait()

            def cond(istate):
                keys_c, t_best, idx_best = istate
                kmin = jnp.min(keys_c, axis=0, keepdims=True)
                alive = lane_alive(kmin, t_best, idx_best)
                return jnp.sum(alive.astype(jnp.float32)) > 0.0

            def body(istate):
                keys_c, t_best, idx_best = istate
                kmin = jnp.min(keys_c, axis=0, keepdims=True)  # [1, RAYS]
                alive = lane_alive(kmin, t_best, idx_best)
                onehot = (keys_c == kmin) & alive  # [C, RAYS]
                keys_c = jnp.where(onehot, INT_MAX, keys_c)
                oh = onehot.astype(jnp.bfloat16)
                g = (mm(tc_hi[...], oh) + mm(tc_mid[...], oh)
                     + mm(tc_lo[...], oh))
                t_best, idx_best = resolve(alive, g, t_best, idx_best)
                return keys_c, t_best, idx_best

            _, t_best, idx_best = jax.lax.while_loop(
                cond, body, (keys_c, t_best, idx_best))
            return t_best, idx_best

        t_best, idx_best = jax.lax.cond(
            skip, lambda a, b: (a, b), visit, t_best, idx_best)
        return k + 1, t_best, idx_best

    _, t_best, idx_best = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), t_best0, idx0))
    miss = t_best >= BIG
    t_out[r:r+1, :] = jnp.where(miss, jnp.inf, t_best)
    idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)


@functools.partial(jax.jit, static_argnames=("kind", "n_chunks", "t_count",
                                             "nf", "treelet", "any_hit",
                                             "interpret"))
def _trace_blocks(boxes, splits, ray_comps, kind, n_chunks, t_count,
                  nf, treelet, any_hit=False, interpret=False):
    blocks = ray_comps[0].shape[0] // SUBROWS
    kernel = functools.partial(
        _treelet_kernel, kind=kind, n_chunks=n_chunks, t_count=t_count,
        any_hit=any_hit)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    rblk = lambda: pl.BlockSpec((SUBROWS, RAYS), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    rows = blocks * SUBROWS
    return pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[vmem()] + [anym()] * 3 + [rblk()] * 7,
        out_specs=(rblk(), rblk()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, RAYS), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAYS), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nf * treelet, CHUNK), jnp.bfloat16),
            pltpu.VMEM((nf * treelet, CHUNK), jnp.bfloat16),
            pltpu.VMEM((nf * treelet, CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(boxes, *splits, *ray_comps)


class TreeletTracer:
    """Closest-hit / any-hit over one primitive family via MXU gathers."""

    def __init__(self, kind, fields, bbox_lo, bbox_hi, interpret=False,
                 treelet=TREELET):
        self.kind = kind
        self.interpret = interpret
        self.treelet = treelet
        (self.boxes, self.splits, self.n_chunks,
         self.t_count) = build_treelets(
            kind, fields, bbox_lo, bbox_hi, treelet=treelet)
        self.t_pad = self.n_chunks * CHUNK

    def _components(self, rays):
        n = rays.origin.shape[0]
        rows = -(-n // RAYS)
        rows = -(-rows // SUBROWS) * SUBROWS
        pad = rows * RAYS - n

        def prep(a, fill):
            a = jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
            return a.reshape(rows, RAYS)

        comps = [prep(rays.origin[:, i], 0.0) for i in range(3)]
        comps += [prep(rays.dir[:, i], 1.0) for i in range(3)]
        comps.append(prep(rays.t_max, -1.0))
        return comps, n

    def trace(self, rays, any_hit=False):
        comps, n = self._components(rays)
        t, idx = _trace_blocks(
            self.boxes, self.splits, tuple(comps),
            kind=self.kind, n_chunks=self.n_chunks, t_count=self.t_count,
            nf=N_FIELDS[self.kind], treelet=self.treelet,
            any_hit=any_hit, interpret=self.interpret)
        return t.reshape(-1)[:n], idx.reshape(-1)[:n]


def tri_tracer(p0, p1, p2, global_base, interpret=False, treelet=TREELET):
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    gid = (global_base + np.arange(p0.shape[0])).astype(np.float32)
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    return TreeletTracer(KIND_TRI, _tri_fields(p0, p1, p2, gid), lo, hi,
                         interpret=interpret, treelet=treelet)


def sphere_tracer(c, r, global_base, interpret=False, treelet=TREELET):
    c = np.asarray(c, np.float32)
    r = np.asarray(r, np.float32)
    gid = (global_base + np.arange(c.shape[0])).astype(np.float32)
    lo, hi = c - r[:, None], c + r[:, None]
    return TreeletTracer(KIND_SPHERE, _sphere_fields(c, r, gid), lo, hi,
                         interpret=interpret, treelet=treelet)


def quad_tracer(o, u, v, global_base, interpret=False, treelet=TREELET):
    o = np.asarray(o, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    gid = (global_base + np.arange(o.shape[0])).astype(np.float32)
    corners = np.stack([o, o + u, o + v, o + u + v])
    return TreeletTracer(KIND_QUAD, _quad_fields(o, u, v, gid),
                         corners.min(0), corners.max(0),
                         interpret=interpret, treelet=treelet)


def disk_tracer(c, n, radial, global_base, interpret=False, treelet=TREELET):
    c = np.asarray(c, np.float32)
    n = np.asarray(n, np.float32)
    radial = np.asarray(radial, np.float32)
    gid = (global_base + np.arange(c.shape[0])).astype(np.float32)
    r = np.sqrt((radial * radial).sum(1, keepdims=True))
    return TreeletTracer(KIND_DISK, _disk_fields(c, n, radial, gid),
                         c - r, c + r, interpret=interpret, treelet=treelet)
