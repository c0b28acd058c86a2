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
UNROLL = 2  # treelet visits per loop iteration (gathers pipeline in a group)
T_MIN = ray_mod.T_MIN
BIG = 3.0e38
INT_MAX = np.int32(2**31 - 1)

KIND_TRI, KIND_QUAD, KIND_SPHERE, KIND_DISK = 0, 1, 2, 3
# Field counts per primitive kind (field-major blocks of TREELET rows).
# Field counts per primitive kind. Normals are derived in-kernel (cross
# products are cheap VPU work; gather rows are the expensive resource) and
# prim identity comes from the (treelet, slot) coordinates, not a field.
N_FIELDS = {KIND_TRI: 9, KIND_QUAD: 9, KIND_SPHERE: 4, KIND_DISK: 7}


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


def _tri_fields(p0, p1, p2):
    return np.concatenate([p0, p1, p2], 1).astype(np.float32)


def _quad_fields(o, eu, ev):
    return np.concatenate([o, eu, ev], 1).astype(np.float32)


def _sphere_fields(c, r):
    return np.concatenate([c, r[:, None]], 1).astype(np.float32)


def _disk_fields(c, n, radial):
    r2 = (radial * radial).sum(1, keepdims=True)
    return np.concatenate([c, n, r2], 1).astype(np.float32)


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
    bf16 (HBM-resident, DMA'd per visited chunk); n_chunks; T_count;\n    slot_prim [T_pad*treelet] i32 mapping packed (treelet,slot) -> prim row).
    """
    fields = np.asarray(fields, np.float32)
    p, nf = fields.shape
    assert nf == N_FIELDS[kind]
    bvh = bvh_mod.build_bvh(bbox_lo, bbox_hi, max_leaf=treelet)
    order = bvh.prim_order
    # Treelets are cut at the *deepest BVH subtree with <= treelet prims*
    # (subtree prim ranges are contiguous in DFS prim_order), not at SAH
    # leaves: SAH keeps splitting below `treelet` whenever it pays for a
    # stack traverser, which leaves treelets ~35% full — and the gather
    # kernel's per-round cost is independent of fill, so fuller treelets
    # mean proportionally fewer rounds. The subtree's own bbox stays tight.
    leaves = []  # (first, count, bbmin, bbmax)
    is_leaf, first, count = bvh.is_leaf, bvh.first, bvh.count
    nn = is_leaf.shape[0]
    # Subtree prim ranges: leaf = [first, first+count); interior = union of
    # children (left child = i+1, right child = first[i], DFS layout).
    r_lo = np.zeros(nn, np.int64)
    r_hi = np.zeros(nn, np.int64)
    for i in range(nn - 1, -1, -1):
        if is_leaf[i]:
            r_lo[i] = first[i]
            r_hi[i] = first[i] + count[i]
        else:
            r_lo[i] = r_lo[i + 1]
            r_hi[i] = r_hi[first[i]]
    stack = [0] if nn else []
    while stack:
        i = stack.pop()
        if r_hi[i] - r_lo[i] <= treelet or is_leaf[i]:
            leaves.append((int(r_lo[i]), int(r_hi[i] - r_lo[i]),
                           bvh.bbox_min[i], bvh.bbox_max[i]))
        else:
            stack.append(int(first[i]))  # right child after left
            stack.append(i + 1)
    leaves.sort(key=lambda l: l[0])  # DFS prim order == spatial locality
    t_count = len(leaves)
    assert t_count <= max_t, f"{t_count} treelets exceeds cap {max_t}"
    t_pad = max(CHUNK, -(-t_count // CHUNK) * CHUNK)
    n_chunks = t_pad // CHUNK

    tbl = np.zeros((nf * treelet, t_pad), np.float32)
    boxes = np.zeros((t_pad, 8), np.float32)
    boxes[:, 0:3] = BIG
    boxes[:, 3:6] = -BIG
    slot_prim = np.full(t_pad * treelet, -1, np.int32)
    for col, (f, c, lo_, hi_) in enumerate(leaves):
        rows = fields[order[f:f + c]]  # [c, F]
        # field-major: row k*treelet + j = field k of slot j
        tbl[:, col].reshape(nf, treelet)[:, :c] = rows.T
        slot_prim[col * treelet:col * treelet + c] = order[f:f + c]
        boxes[col, 0:3] = lo_
        boxes[col, 3:6] = hi_
    # Chunk-level bounds (union of the chunk's treelet boxes; DFS order
    # keeps chunks spatially tight): the outer walk's skip bounds come
    # from ONE slab test per chunk instead of per-treelet phase-1 keys.
    cboxes = np.zeros((max(n_chunks, 1), 8), np.float32)
    cboxes[:, 0:3] = BIG
    cboxes[:, 3:6] = -BIG
    for k in range(n_chunks):
        seg = boxes[k * CHUNK:(k + 1) * CHUNK]
        real = seg[:, 0] < BIG
        if real.any():
            cboxes[k, 0:3] = seg[real, 0:3].min(0)
            cboxes[k, 3:6] = seg[real, 3:6].max(0)
    hi, mid, lo = _split3(tbl)
    # The three bf16 splits are stacked into ONE table [3*F*treelet, CHUNK]
    # so each round issues a single matmul + DMA (three separate matmuls
    # measured ~1us fixed overhead each on v5e — the stacked form is the
    # same MACs with a third of the issue cost).
    stacked = np.concatenate([hi, mid, lo], axis=0)

    def chunked(a):
        # [rows, t_pad] -> [n_chunks, rows, CHUNK]
        a = np.asarray(a)
        return jnp.asarray(
            np.ascontiguousarray(
                a.reshape(a.shape[0], n_chunks, CHUNK).transpose(1, 0, 2)))

    world_lo = np.min([l[2] for l in leaves], axis=0)
    world_hi = np.max([l[3] for l in leaves], axis=0)
    return (
        jnp.asarray(boxes),
        jnp.asarray(cboxes),
        chunked(stacked),
        n_chunks, t_count, jnp.asarray(slot_prim),
        (world_lo, world_hi),
    )


# ---------------------------------------------------------------------------
# Primitive tests, operand shapes [TREELET, RAYS] (prims x rays) with the
# ray components broadcast from [1, RAYS]. All component-form; same math as
# accel/mesh_pallas.py / the reference shape/src/simple.rs.
# ---------------------------------------------------------------------------

def _test_prims(kind, g, nf, treelet, rox, roy, roz, rdx, rdy, rdz, t_max):
    """g: gathered [nf*treelet, RAYS] f32 — or a callable k -> [treelet, X]
    field accessor (the dynamic-fetch kernels reconstruct fields from a
    different layout). Returns (t [treelet,R], ok).

    Normals for planar prims are derived in-kernel by cross products: they
    drop out of scale in every test below (plane t and signed-area signs are
    scale-invariant), and all-zero padding slots yield zero normals ->
    denom == 0 -> never pass."""
    f = g if callable(g) else (
        lambda k: g[k * treelet:(k + 1) * treelet])
    if kind == KIND_SPHERE:
        cx, cy, cz, r = f(0), f(1), f(2), f(3)
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
        return t, ok
    if kind == KIND_QUAD:
        ox_, oy_, oz_ = f(0), f(1), f(2)
        ux, uy, uz = f(3), f(4), f(5)
        vx, vy, vz = f(6), f(7), f(8)
        nx = uy * vz - uz * vy
        ny = uz * vx - ux * vz
        nz = ux * vy - uy * vx
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
        return t, ok
    if kind == KIND_DISK:
        cx_, cy_, cz_ = f(0), f(1), f(2)
        nx, ny, nz = f(3), f(4), f(5)
        r2 = f(6)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((cx_ - rox) * nx + (cy_ - roy) * ny + (cz_ - roz) * nz) / denom_s
        hx = rox + t * rdx - cx_
        hy = roy + t * rdy - cy_
        hz = roz + t * rdz - cz_
        ok = ((denom != 0.0) & (hx * hx + hy * hy + hz * hz <= r2)
              & (t >= T_MIN) & (t < t_max))
        return t, ok
    # KIND_TRI — Moller-Trumbore (same accept set as the reference's
    # barycentric-plane method, ~half the VPU ops; boundary ties resolve
    # by strict-inequality like the reference's sign test,
    # shape/src/simple.rs:435-475)
    p0x, p0y, p0z = f(0), f(1), f(2)
    p1x, p1y, p1z = f(3), f(4), f(5)
    p2x, p2y, p2z = f(6), f(7), f(8)
    e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
    e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
    # pvec = d x e2
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tvx, tvy, tvz = rox - p0x, roy - p0y, roz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    ok = ((det != 0.0) & (u > 0.0) & (v > 0.0) & (u + v < 1.0)
          & (t >= T_MIN) & (t < t_max))
    return t, ok


LOCAL_BITS = 7  # log2(CHUNK): low key bits carry the in-chunk treelet id
LOCAL_MASK = np.int32((1 << LOCAL_BITS) - 1)


def _treelet_kernel(boxes_ref, cboxes_ref, tab_ref,
                    ox, oy, oz, dx, dy, dz, tmax,
                    t_out, idx_out, tc, sems, *,
                    kind, n_chunks, t_count, treelet, any_hit,
                    rays=RAYS, subrows=SUBROWS, resident=False,
                    debug_rounds=False):
    # Blocks are [subrows, rays]; each sublane row is an independent batch
    # of `rays` rays (TPU block shapes must be sublane-divisible).
    row_fn = _treelet_row_resident if resident else _treelet_row
    for r in range(subrows):
        row_fn(boxes_ref, cboxes_ref, tab_ref,
               ox, oy, oz, dx, dy, dz, tmax, t_out, idx_out,
               tc, sems,
               r, kind=kind, n_chunks=n_chunks, t_count=t_count,
               treelet=treelet, any_hit=any_hit, rays=rays,
               debug_rounds=debug_rounds)


def _treelet_row_resident(boxes_ref, cboxes_ref, tab_ref,
                          ox, oy, oz, dx, dy, dz, tmax,
                          t_out, idx_out, tc, sems,
                          r, *, kind, n_chunks, t_count, treelet, any_hit,
                          rays=RAYS, debug_rounds=False):
    """Single-loop variant for scenes whose whole gather table fits VMEM.

    Keys for EVERY treelet are computed once into a resident [t_pad, rays]
    scratch with *global* treelet ids in the low bits; one flat while loop
    then repeatedly (1) finds each lane's global min key, (2) picks the
    round's chunk as the smallest chunk any participating lane wants, and
    (3) gathers from the VMEM-resident table slice for that chunk — no
    DMA, no outer chunk loop, no lax.cond, and exact global front-to-back
    ordering per lane (the chunked path only orders within a chunk).
    """
    nf = N_FIELDS[kind]
    t_pad = n_chunks * CHUNK
    gbits = max(LOCAL_BITS, int(np.ceil(np.log2(max(t_pad, 2)))))
    gmask = np.int32((1 << gbits) - 1)
    rox, roy, roz = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]  # [1, rays]
    rdx, rdy, rdz = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]
    t_max = tmax[r:r+1, :]
    # All-dead row early-out (dead lanes carry t_max <= 0): write misses
    # and skip phase 1 + the round loop for the whole 1024-lane row.
    t_out[r:r+1, :] = jnp.full((1, rays), jnp.inf, jnp.float32)
    idx_out[r:r+1, :] = jnp.full((1, rays), -1, jnp.int32)

    @pl.when(jnp.any(t_max > 0.0))
    def _run_row():
        inv_x = 1.0 / jnp.where(rdx == 0.0, 1e-30, rdx)
        inv_y = 1.0 / jnp.where(rdy == 0.0, 1e-30, rdy)
        inv_z = 1.0 / jnp.where(rdz == 0.0, 1e-30, rdz)

        def all_keys():
            boxes = boxes_ref[...]  # [t_pad, 8]
            tx0 = (boxes[:, 0:1] - rox) * inv_x  # [t_pad, rays]
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
            gid = jax.lax.broadcasted_iota(jnp.int32, (t_pad, rays), 0)
            hit_box = ((t_enter <= t_exit) & (t_exit >= T_MIN)
                       & (t_enter < t_max) & (gid < t_count))
            te = jnp.clip(t_enter, 0.0, BIG)
            kbits = jax.lax.bitcast_convert_type(te, jnp.int32)
            return jnp.where(hit_box, (kbits & ~gmask) | gid, INT_MAX)

        def lane_alive(kmin, t_best, idx_best):
            t_lb = jax.lax.bitcast_convert_type(kmin & ~gmask, jnp.float32)
            alive = (kmin != INT_MAX) & (t_lb < t_best)
            if any_hit:
                alive = alive & (idx_best < 0)
            return alive

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (treelet, rays), 0)

        def resolve(alive, g, tid_global, t_best, idx_best):
            t_c, ok = _test_prims(
                kind, g, nf, treelet, rox, roy, roz, rdx, rdy, rdz, t_max)
            t_c = jnp.where(ok & alive, t_c, BIG)
            tmin = jnp.min(t_c, axis=0, keepdims=True)  # [1, rays]
            slot_sel = jnp.min(
                jnp.where(t_c == tmin, slot_iota, INT_MAX),
                axis=0, keepdims=True)
            packed = tid_global * treelet + slot_sel
            closer = tmin < t_best
            t_best = jnp.where(closer, tmin, t_best)
            idx_best = jnp.where(closer, packed, idx_best)
            return t_best, idx_best

        # Keys are a while-loop VALUE (not a scratch ref: ref writes inside a
        # Pallas while body do not persist across iterations). Marking uses a
        # full-plane where (the per-column min is unique), so no dynamic
        # update-slice is needed; the gather one-hot reads one CHUNK slice.
        # Hard bound: every round clears >= 1 finite key from the plane
        # (the taking lanes' per-column min), and the plane holds at most
        # t_count keys per lane column — so t_count * rays rounds is
        # impossible. The cap makes that a hardware-enforced guarantee:
        # a runaway while loop wedges the whole shared chip (round-3
        # post-mortem), so every device loop gets one.
        round_cap = float(t_count) * float(rays) + float(UNROLL)

        def cond(state):
            keys, t_best, idx_best, nround = state
            kmin = jnp.min(keys, axis=0, keepdims=True)
            go = jnp.sum(
                lane_alive(kmin, t_best, idx_best).astype(jnp.float32)) > 0.0
            return go & (nround < round_cap)

        def body(state):
            keys, t_best, idx_best, nround = state
            rows3 = nf * treelet * 3
            pending = None
            for _ in range(UNROLL):
                nround = nround + 1.0
                kmin = jnp.min(keys, axis=0, keepdims=True)
                alive = lane_alive(kmin, t_best, idx_best)
                tid = kmin & gmask  # [1, rays] global treelet id
                lane_chunk = jnp.where(alive, tid // CHUNK, n_chunks)
                # scalar chunk for this round (clamped: all-dead rounds index
                # chunk 0 with an empty one-hot)
                c = jnp.minimum(jnp.min(lane_chunk), n_chunks - 1)
                take = alive & (lane_chunk == c)
                # Full-plane mark (the per-column min is unique); the gather's
                # chunk-aligned one-hot folds the mark plane with a static
                # chunk loop (Mosaic has no dynamic_slice on values).
                mark = (keys == kmin) & take  # [t_pad, rays]
                keys = jnp.where(mark, INT_MAX, keys)
                if n_chunks == 1:
                    onehot = mark
                else:
                    onehot = jnp.zeros((CHUNK, rays), bool)
                    for k in range(n_chunks):
                        onehot = onehot | ((c == k)
                                           & mark[k * CHUNK:(k + 1) * CHUNK])
                g3 = mm(tab_ref[c], onehot.astype(jnp.bfloat16))
                f3 = rows3 // 3
                g = g3[0:f3] + g3[f3:2 * f3] + g3[2 * f3:]
                if pending is not None:
                    t_best, idx_best = resolve(*pending, t_best, idx_best)
                pending = (take, g, tid)
            t_best, idx_best = resolve(*pending, t_best, idx_best)
            return keys, t_best, idx_best, nround

        t_best0 = jnp.full((1, rays), BIG, jnp.float32)
        idx0 = jnp.full((1, rays), -1, jnp.int32)
        _, t_best, idx_best, nround = jax.lax.while_loop(
            cond, body,
            (all_keys(), t_best0, idx0, jnp.zeros((), jnp.float32)))
        miss = t_best >= BIG
        if debug_rounds:
            t_out[r:r+1, :] = jnp.broadcast_to(nround * 100.0, (1, rays))
            idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)
            return
        t_out[r:r+1, :] = jnp.where(miss, jnp.inf, t_best)
        idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)


def _rowdense_kernel(boxes_ref, cboxes_ref, tab_ref,
                     ox, oy, oz, dx, dy, dz, tmax,
                     t_out, idx_out, rowkey_s, *scratch,
                     kind, t_pad, t_count, treelet, any_hit,
                     rays=RAYS, subrows=SUBROWS, fetch="onehot",
                     debug_rounds=False):
    tab_s, dma_sem = scratch if scratch else (None, None)
    for r in range(subrows):
        _rowdense_row(boxes_ref, cboxes_ref, tab_ref,
                      ox, oy, oz, dx, dy, dz, tmax, t_out, idx_out,
                      rowkey_s,
                      r, kind=kind, t_pad=t_pad, t_count=t_count,
                      treelet=treelet, any_hit=any_hit, rays=rays,
                      fetch=fetch, debug_rounds=debug_rounds,
                      tab_s=tab_s, dma_sem=dma_sem)


def _rowdense_row(boxes_ref, cboxes_ref, tab_ref,
                  ox, oy, oz, dx, dy, dz, tmax,
                  t_out, idx_out, rowkey_s,
                  r, *, kind, t_pad, t_count, treelet, any_hit,
                  rays=RAYS, fetch="onehot", debug_rounds=False,
                  tab_s=None, dma_sem=None):
    """Row-shared dense traversal: the whole 1024-lane row visits ONE
    treelet per round, chosen by the row-minimum entry key, and tests its
    64 slots densely on the VPU.

    The per-lane one-hot kernels gather a DIFFERENT treelet per lane each
    round, which costs a [3*F*treelet, CHUNK] x [CHUNK, rays] MXU matmul —
    ~221k MACs per lane per round (ARCHITECTURE.md section 10 roofline).
    When lanes are coherent they mostly want the SAME treelet, so the
    gather collapses to one column: a [3*F*treelet, t_pad] x [t_pad, 1]
    one-hot (same bit-exact bf16 3-split reconstruction, ~1/rays of the
    MACs) plus the identical dense [treelet, rays] VPU test. Bookkeeping
    is a [t_pad, 1] row-key vector: key = min over lanes of the lane's
    quantized t_enter with the treelet id in the low bits (distinct,
    int-comparable, a conservative lower bound — so front-to-back order
    and the termination test stay exact). The row stops when the nearest
    unvisited treelet cannot beat the row's farthest unresolved lane.

    Coherent rows visit ~(per-ray round count) treelets total; fully
    incoherent rows degrade toward the row's union of treelets, so the
    caller picks this mode for primary/shadow-like batches (or sorts
    lanes first) and the per-lane kernels otherwise.
    """
    nf = N_FIELDS[kind]
    gbits = max(1, int(np.ceil(np.log2(max(t_pad, 2)))))
    gmask = np.int32((1 << gbits) - 1)
    rox, roy, roz = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]  # [1, rays]
    rdx, rdy, rdz = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]
    t_max = tmax[r:r+1, :]
    t_out[r:r+1, :] = jnp.full((1, rays), jnp.inf, jnp.float32)
    idx_out[r:r+1, :] = jnp.full((1, rays), -1, jnp.int32)
    n_chunks = t_pad // CHUNK

    inv_x = 1.0 / jnp.where(rdx == 0.0, 1e-30, rdx)
    inv_y = 1.0 / jnp.where(rdy == 0.0, 1e-30, rdy)
    inv_z = 1.0 / jnp.where(rdz == 0.0, 1e-30, rdz)

    def slab(boxes):
        """boxes [B, 8] vs the row's rays -> (t_enter, hit) [B, rays]."""
        tx0 = (boxes[:, 0:1] - rox) * inv_x
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
        hit = (t_enter <= t_exit) & (t_exit >= T_MIN) & (t_enter < t_max)
        return t_enter, hit

    # Chunk-box prefilter ([n_chunks, rays], tiny): rows that miss every
    # chunk write misses and skip init + visits entirely — with Morton
    # lane order most camera rows never touch a given family's geometry.
    _, chit = slab(cboxes_ref[...])
    # int32, not bool: Mosaic can't squeeze a bool vector element to a
    # scalar inside the per-chunk pl.when below (multi-chunk only, which
    # the single-chunk interior/test scenes never hit).
    chunk_any = jnp.any(chit, axis=1).astype(jnp.int32)  # [n_chunks]

    @pl.when((jnp.any(t_max > 0.0)) & (jnp.sum(chunk_any) > 0))
    def _run_row():

        def chunk_keys(k):
            boxes = boxes_ref[k * CHUNK:(k + 1) * CHUNK, :]
            t_enter, hit_box = slab(boxes)
            gid = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, rays), 0)
                   + k * CHUNK)
            hit_box = hit_box & (gid < t_count)
            te = jnp.clip(t_enter, 0.0, BIG)
            kbits = jax.lax.bitcast_convert_type(te, jnp.int32)
            keys = jnp.where(hit_box, (kbits & ~gmask) | gid, INT_MAX)
            return jnp.min(keys, axis=1, keepdims=True)  # [CHUNK, 1]

        def row_keys():
            if n_chunks == 1:
                return chunk_keys(0)
            rowkey_s[...] = jnp.full((t_pad, 1), INT_MAX, jnp.int32)
            for k in range(n_chunks):
                @pl.when(chunk_any[k] > 0)
                def _fill(k=k):
                    rowkey_s[k * CHUNK:(k + 1) * CHUNK, :] = chunk_keys(k)
            return rowkey_s[...]  # [t_pad, 1]

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (treelet, rays), 0)
        gid_col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
        live0 = t_max > 0.0

        def cond(state):
            rowkey, t_best, idx_best, nround = state
            kmin = jnp.min(rowkey, axis=0, keepdims=True)  # [1, 1]
            t_lb = jax.lax.bitcast_convert_type(kmin & ~gmask, jnp.float32)
            go = jnp.any((kmin != INT_MAX)
                         & (t_lb < jnp.max(t_best)))
            if any_hit:
                go = go & jnp.any((idx_best < 0) & live0)
            # Hard bound: every round clears one treelet, so > t_count
            # rounds is impossible — the guard makes that a guarantee the
            # hardware enforces even under a miscompile (a wedged while
            # loop takes the whole shared chip down with it).
            return go & (nround < t_count + 1)

        def body(state):
            rowkey, t_best, idx_best, nround = state
            if fetch == "dynhbm":
                # HBM-resident dynamic fetch: same slot-major
                # [t_pad, treelet, 3*nf] split table as fetch="dyn", but
                # the table stays in HBM (memory_space=ANY) and the row's
                # chosen treelet block is DMA'd into a VMEM scratch each
                # round — ~treelet*3*nf*2 bytes per visit, no VMEM gate
                # on the table size, so interior-scale meshes keep the
                # no-matmul fetch. [round-4 VERDICT #1's scalar-prefetch
                # DMA prescription; ref: BLAS node fetch in
                # /root/reference/shape/src/blas.rs:422-476]
                kmin_s = jnp.min(rowkey)  # scalar
                tid = jnp.minimum(kmin_s & gmask, t_pad - 1)
                rowkey = jnp.where(gid_col == tid, INT_MAX, rowkey)
                cp = pltpu.make_async_copy(tab_ref.at[tid], tab_s,
                                           dma_sem)
                cp.start()
                cp.wait()
                v = tab_s[...]  # [treelet, 3*nf] bf16

                def fget(k):
                    return (v[:, k:k + 1].astype(jnp.float32)
                            + v[:, nf + k:nf + k + 1].astype(jnp.float32)
                            + v[:, 2 * nf + k:2 * nf + k + 1].astype(
                                jnp.float32))

                g = fget
                kmin = jnp.broadcast_to(kmin_s, (1, 1))
            elif fetch == "dyn":
                # Dynamic fetch (round-4 VERDICT #1): the row's single
                # chosen treelet is read with ONE scalar-indexed
                # leading-dim load from the [t_pad, treelet, 3*nf] bf16
                # split table — no matmul, no O(t_pad) MAC cost. Fields
                # come back slot-major ([treelet, 3*nf] with slots on
                # sublanes), so each field is three static lane slices
                # summed in f32 (bit-exact 3-split reconstruction, same
                # invariant as the one-hot path).
                kmin_s = jnp.min(rowkey)  # scalar
                tid = jnp.minimum(kmin_s & gmask, t_pad - 1)
                rowkey = jnp.where(gid_col == tid, INT_MAX, rowkey)
                v = tab_ref[tid]  # [treelet, 3*nf] bf16

                def fget(k):
                    return (v[:, k:k + 1].astype(jnp.float32)
                            + v[:, nf + k:nf + k + 1].astype(jnp.float32)
                            + v[:, 2 * nf + k:2 * nf + k + 1].astype(
                                jnp.float32))

                g = fget
                kmin = jnp.broadcast_to(kmin_s, (1, 1))
            else:
                kmin = jnp.min(rowkey, axis=0, keepdims=True)  # [1, 1]
                tid = kmin & gmask
                onehot = (gid_col == tid).astype(jnp.bfloat16)  # [t_pad, 1]
                rowkey = jnp.where(gid_col == tid, INT_MAX, rowkey)
                g3 = mm(tab_ref[...], onehot)  # [3*nf*treelet, 1]
                f3 = nf * treelet
                g = g3[0:f3] + g3[f3:2 * f3] + g3[2 * f3:]  # exact f32
            t_c, ok = _test_prims(
                kind, g, nf, treelet, rox, roy, roz, rdx, rdy, rdz, t_best)
            t_c = jnp.where(ok, t_c, BIG)
            tmin = jnp.min(t_c, axis=0, keepdims=True)  # [1, rays]
            slot_sel = jnp.min(
                jnp.where(t_c == tmin, slot_iota, INT_MAX),
                axis=0, keepdims=True)
            packed = tid * treelet + slot_sel
            closer = tmin < t_best
            if any_hit:
                closer = closer & (idx_best < 0)
            t_best = jnp.where(closer, tmin, t_best)
            idx_best = jnp.where(closer, packed, idx_best)
            return rowkey, t_best, idx_best, nround + 1.0

        # Clamp the initial bound to the BIG sentinel: camera rays carry
        # t_max = +inf, and an unclamped bound lets an all-miss round
        # (tmin == BIG) pass `tmin < t_best` and record a phantom hit at
        # t = BIG (whole rows of bogus ids -> NaN normals downstream).
        # Every t_max used in tests was 3e38 == BIG, which masked this.
        t_best0 = jnp.where(live0, jnp.minimum(t_max, BIG), -BIG)
        idx0 = jnp.full((1, rays), -1, jnp.int32)
        _, t_best, idx_best, nround = jax.lax.while_loop(
            cond, body,
            (row_keys(), t_best0, idx0, jnp.zeros((), jnp.float32)))
        miss = idx_best < 0
        if debug_rounds:
            t_out[r:r+1, :] = jnp.broadcast_to(nround * 100.0, (1, rays))
            idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)
            return
        t_out[r:r+1, :] = jnp.where(miss, jnp.inf, t_best)
        idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)


def _treelet_row(boxes_ref, cboxes_ref, tab_ref,
                 ox, oy, oz, dx, dy, dz, tmax,
                 t_out, idx_out, tc, sems,
                 r, *, kind, n_chunks, t_count, treelet, any_hit,
                 rays=RAYS, debug_rounds=False):
    """Trace `rays` rays (row r of the block) against all chunks.

    Phase 1 slab-tests the CHUNK bounds only ([n_chunks, rays] — a
    conservative per-lane lower bound of every treelet key in the chunk;
    round-2 computed per-treelet keys for all chunks up front, an O(T x R)
    pass that dominated large scenes). The outer loop walks chunks in DFS
    (spatial) order, skipping any chunk whose box cannot beat the lane's
    current hit; a visited chunk's table splits are DMA'd from HBM into
    VMEM scratch and its per-treelet keys computed lazily, then the inner
    loop lets every lane pull its treelets strictly in t-lower-bound order
    (one MXU one-hot gather per round) until no lane can improve.
    """
    nf = N_FIELDS[kind]
    rox, roy, roz = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]  # [1, rays]
    rdx, rdy, rdz = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]
    t_max = tmax[r:r+1, :]
    # All-dead row early-out (dead lanes carry t_max <= 0): write misses
    # and skip phase 1 + the round loop for the whole 1024-lane row.
    t_out[r:r+1, :] = jnp.full((1, rays), jnp.inf, jnp.float32)
    idx_out[r:r+1, :] = jnp.full((1, rays), -1, jnp.int32)

    @pl.when(jnp.any(t_max > 0.0))
    def _run_row():
        inv_x = 1.0 / jnp.where(rdx == 0.0, 1e-30, rdx)
        inv_y = 1.0 / jnp.where(rdy == 0.0, 1e-30, rdy)
        inv_z = 1.0 / jnp.where(rdz == 0.0, 1e-30, rdz)

        def chunk_keys(boxes, base):
            """Slab-test one chunk's boxes -> int32 traversal keys [C, rays].

            boxes: [CHUNK, 8] (xlo,ylo,zlo,xhi,yhi,zhi,_,_). Key = bits of the
            clipped t_enter with the low LOCAL_BITS replaced by the in-chunk
            treelet id — int-comparable, distinct, and a conservative *lower*
            bound of t_enter (clearing mantissa bits only decreases the float).
            """
            tx0 = (boxes[:, 0:1] - rox) * inv_x  # [C, rays]
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
            lid = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, rays), 0)
            # Padding columns (bbox +BIG/-BIG) can pass the slab test through
            # f32 overflow (inf*x) — mask them out explicitly.
            hit_box = ((t_enter <= t_exit) & (t_exit >= T_MIN)
                       & (t_enter < t_max) & (base + lid < t_count))
            te = jnp.clip(t_enter, 0.0, BIG)
            kbits = jax.lax.bitcast_convert_type(te, jnp.int32)
            return jnp.where(hit_box, (kbits & ~LOCAL_MASK) | lid, INT_MAX)

        # ---- phase 1: chunk-box slab test -> per-lane chunk lower bounds.
        # Keys carry no treelet id (pure clipped-t_enter bits); stripping
        # LOCAL_MASK in lane_alive only lowers the bound further, so the
        # shared comparison logic stays conservative.
        def chunk_box_keys():
            cb = cboxes_ref[...]  # [n_chunks(pad to >=1), 8]
            tx0 = (cb[:, 0:1] - rox) * inv_x  # [n_chunks, rays]
            tx1 = (cb[:, 3:4] - rox) * inv_x
            ty0 = (cb[:, 1:2] - roy) * inv_y
            ty1 = (cb[:, 4:5] - roy) * inv_y
            tz0 = (cb[:, 2:3] - roz) * inv_z
            tz1 = (cb[:, 5:6] - roz) * inv_z
            t_enter = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1))
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1))
            hit_box = (t_enter <= t_exit) & (t_exit >= T_MIN) & (
                t_enter < t_max)
            te = jnp.clip(t_enter, 0.0, BIG)
            kbits = jax.lax.bitcast_convert_type(te, jnp.int32)
            return jnp.where(hit_box, kbits, INT_MAX)

        chunkmins = chunk_box_keys()

        t_best0 = jnp.full((1, rays), BIG, jnp.float32)
        idx0 = jnp.full((1, rays), -1, jnp.int32)
        crow = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, rays), 0)

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

        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (treelet, rays), 0)

        def resolve(alive, g, tid_global, t_best, idx_best):
            """Dense prim test of the gathered treelet + best-hit update.
            Winner identity is packed as tid_global*treelet + slot; the host
            maps it to the family's prim index via slot_prim."""
            t_c, ok = _test_prims(
                kind, g, nf, treelet, rox, roy, roz, rdx, rdy, rdz, t_max)
            t_c = jnp.where(ok & alive, t_c, BIG)
            tmin = jnp.min(t_c, axis=0, keepdims=True)  # [1, rays]
            slot_sel = jnp.min(
                jnp.where(t_c == tmin, slot_iota, INT_MAX),
                axis=0, keepdims=True)
            packed = tid_global * treelet + slot_sel
            closer = tmin < t_best
            t_best = jnp.where(closer, tmin, t_best)
            idx_best = jnp.where(closer, packed, idx_best)
            return t_best, idx_best

        def outer_cond(state):
            k, t_best, idx_best, nround, nchunk = state
            t_best, idx_best = t_best, idx_best
            rem = jnp.min(jnp.where(crow >= k, chunkmins, INT_MAX),
                          axis=0, keepdims=True)
            alive = lane_alive(rem, t_best, idx_best)
            # Hard bound: k increments every iteration, so n_chunks
            # iterations is the ceiling (shared-chip wedge guard; the
            # alive test alone already implies it when crow is
            # well-formed, the cap holds even when it is not).
            return (jnp.sum(alive.astype(jnp.float32)) > 0.0) & (k < n_chunks)

        def outer_body(state):
            k, t_best, idx_best, nround, nchunk = state
            this = jnp.min(jnp.where(crow == k, chunkmins, INT_MAX),
                           axis=0, keepdims=True)
            want = lane_alive(this, t_best, idx_best)
            skip = jnp.sum(want.astype(jnp.float32)) == 0.0

            def visit(t_best, idx_best, nround, nchunk):
                nchunk = nchunk + 1.0
                # DMA this chunk's stacked table HBM -> VMEM scratch.
                cp = pltpu.make_async_copy(tab_ref.at[k], tc, sems.at[0])
                cp.start()
                keys_c = chunk_keys(boxes_ref[pl.ds(k * CHUNK, CHUNK), :],
                                    k * CHUNK)
                cp.wait()

                # Hard bound: every round clears one key per alive lane
                # from the [CHUNK, rays] plane, so an alive lane exists
                # for at most CHUNK rounds (wedge guard — see outer_cond).
                def cond(istate):
                    keys_c, t_best, idx_best, nround, iround = istate
                    kmin = jnp.min(keys_c, axis=0, keepdims=True)
                    alive = lane_alive(kmin, t_best, idx_best)
                    return (jnp.sum(alive.astype(jnp.float32)) > 0.0) & (
                        iround < float(CHUNK + UNROLL))

                def body(istate):
                    keys_c, t_best, idx_best, nround, iround = istate
                    iround = iround + 1.0
                    # Unrolled rounds with the alive mask frozen for the group:
                    # the next one-hot depends only on key marking (pure VPU),
                    # not on the previous resolve, so the UNROLL gathers
                    # pipeline on the MXU while resolves overlap on the VPU.
                    # A lane may test up to UNROLL-1 treelets past the point
                    # where its hit already beats every remaining key — extra
                    # visits bought for ~2x less serialization.
                    rows3 = tc.shape[0]
                    f3 = rows3 // 3
                    pending = None
                    for _ in range(UNROLL):
                        nround = nround + 1.0
                        kmin = jnp.min(keys_c, axis=0, keepdims=True)
                        alive = lane_alive(kmin, t_best, idx_best)
                        onehot = (keys_c == kmin) & alive  # [C, rays]
                        keys_c = jnp.where(onehot, INT_MAX, keys_c)
                        g3 = mm(tc[...], onehot.astype(jnp.bfloat16))
                        g = g3[0:f3] + g3[f3:2 * f3] + g3[2 * f3:]
                        if pending is not None:
                            t_best, idx_best = resolve(*pending, t_best, idx_best)
                        pending = (alive, g, k * CHUNK + (kmin & LOCAL_MASK))
                    t_best, idx_best = resolve(*pending, t_best, idx_best)
                    return keys_c, t_best, idx_best, nround, iround

                _, t_best, idx_best, nround, _ = jax.lax.while_loop(
                    cond, body,
                    (keys_c, t_best, idx_best, nround,
                     jnp.zeros((), jnp.float32)))
                return t_best, idx_best, nround, nchunk

            t_best, idx_best, nround, nchunk = jax.lax.cond(
                skip, lambda a, b, c, d: (a, b, c, d), visit,
                t_best, idx_best, nround, nchunk)
            return k + 1, t_best, idx_best, nround, nchunk

        _, t_best, idx_best, nround, nchunk = jax.lax.while_loop(
            outer_cond, outer_body,
            (jnp.int32(0), t_best0, idx0, jnp.zeros((), jnp.float32),
             jnp.zeros((), jnp.float32)))
        miss = t_best >= BIG
        if debug_rounds:
            t_out[r:r+1, :] = jnp.broadcast_to(nround * 100.0 + nchunk,
                                               (1, rays))
            idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)
            return
        t_out[r:r+1, :] = jnp.where(miss, jnp.inf, t_best)
        idx_out[r:r+1, :] = jnp.where(miss, -1, idx_best)


@functools.partial(jax.jit, static_argnames=("kind", "n_chunks", "t_count",
                                             "nf", "treelet", "any_hit",
                                             "rays", "subrows", "resident",
                                             "interpret", "debug_rounds"))
def _trace_blocks(boxes, cboxes, table, ray_comps, kind, n_chunks, t_count,
                  nf, treelet, any_hit=False, rays=RAYS, subrows=SUBROWS,
                  resident=False, interpret=False, debug_rounds=False):
    blocks = ray_comps[0].shape[0] // subrows
    kernel = functools.partial(
        _treelet_kernel, kind=kind, n_chunks=n_chunks, t_count=t_count,
        treelet=treelet, any_hit=any_hit, rays=rays, subrows=subrows,
        resident=resident, debug_rounds=debug_rounds)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = lambda: pl.BlockSpec(memory_space=pl.ANY)
    rblk = lambda: pl.BlockSpec((subrows, rays), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    rows = blocks * subrows
    return pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[vmem(), vmem()] + [vmem() if resident else anym()]
        + [rblk()] * 7,
        out_specs=(rblk(), rblk()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, rays), jnp.float32),
            jax.ShapeDtypeStruct((rows, rays), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, CHUNK) if resident
                       else (3 * nf * treelet, CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(boxes, cboxes, table, *ray_comps)


def _trace_blocks_rowdense(boxes, cboxes, table_flat, ray_comps, kind,
                           t_pad, t_count, nf, treelet, any_hit=False,
                           rays=RAYS, subrows=SUBROWS, fetch="onehot",
                           interpret=False, debug_rounds=False):
    blocks = ray_comps[0].shape[0] // subrows
    kernel = functools.partial(
        _rowdense_kernel, kind=kind, t_pad=t_pad, t_count=t_count,
        treelet=treelet, any_hit=any_hit, rays=rays, subrows=subrows,
        fetch=fetch, debug_rounds=debug_rounds)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = lambda: pl.BlockSpec(memory_space=pl.ANY)
    rblk = lambda: pl.BlockSpec((subrows, rays), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    rows = blocks * subrows
    scratch = [pltpu.VMEM((t_pad, 1), jnp.int32)]
    if fetch == "dynhbm":
        # Per-round DMA destination + completion semaphore; the table
        # itself stays HBM-resident (ANY).
        scratch += [pltpu.VMEM((treelet, 3 * nf), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[vmem(), vmem(),
                  anym() if fetch == "dynhbm" else vmem()] + [rblk()] * 7,
        out_specs=(rblk(), rblk()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, rays), jnp.float32),
            jax.ShapeDtypeStruct((rows, rays), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(boxes, cboxes, table_flat, *ray_comps)


class TreeletTracer:
    """Closest-hit / any-hit over one primitive family via MXU gathers."""

    def __init__(self, kind, fields, bbox_lo, bbox_hi, global_base=0,
                 interpret=False, treelet=TREELET, rays=RAYS,
                 subrows=SUBROWS):
        self.kind = kind
        self.interpret = interpret
        self.treelet = treelet
        self.rays = rays
        self.subrows = subrows
        (self.boxes, self.cboxes, self.table, self.n_chunks,
         self.t_count, slot_prim, self.world_bounds) = build_treelets(
            kind, fields, bbox_lo, bbox_hi, treelet=treelet)
        # Fully-VMEM-resident single-loop mode. Measured on v5e: wins only
        # at n_chunks == 1 (no DMA, no outer loop, same ordering); with
        # multiple chunks the global-min bookkeeping + chunk serialization
        # loses ~15% to the chunked walk, so it stays off there.
        tab_bytes = self.n_chunks * 3 * N_FIELDS[kind] * treelet * CHUNK * 2
        self.resident = self.n_chunks == 1 and tab_bytes <= (4 << 20)
        # packed (treelet, slot) -> global prim id (-1 for empty slots).
        # global_base: int offset for a contiguous family range, or an
        # int array mapping local prim row -> global prim id (lets a
        # tracer serve a non-contiguous SUBSET of a family — e.g. the
        # dense-mesh side of the big/small triangle partition in
        # trace_pallas.PallasTracer).
        sp = np.asarray(slot_prim)
        if isinstance(global_base, (int, np.integer)):
            gid = sp + int(global_base)
        else:
            id_map = np.asarray(global_base, np.int64)
            gid = np.where(sp >= 0, id_map[np.clip(sp, 0, None)], -1)
        self.slot_gid = jnp.asarray(
            np.where(sp >= 0, gid, -1).astype(np.int32))
        self.t_pad = self.n_chunks * CHUNK
        # Row-dense mode (one shared treelet visit per 1024-lane row; see
        # _rowdense_row): needs the whole stacked table VMEM-resident.
        nf = N_FIELDS[kind]
        flat_bytes = 3 * nf * treelet * self.t_pad * 2
        self.rowdense_ok = flat_bytes <= (6 << 20)
        if self.rowdense_ok:
            # [n_chunks, 3*nf*treelet, CHUNK] -> [3*nf*treelet, t_pad]
            tbl = np.asarray(self.table)
            self.table_flat = jnp.asarray(
                np.ascontiguousarray(
                    tbl.transpose(1, 0, 2).reshape(
                        3 * nf * treelet, self.t_pad)))
        else:
            self.table_flat = None
        # Dynamic-fetch row-dense ("rowdyn"): slot-major [t_pad, treelet,
        # 3*nf] bf16 split table, read per round with one scalar-indexed
        # leading-dim load instead of a one-hot matmul. The lane dim (3*nf
        # <= 27) pads to 128 in VMEM, so the footprint is treelet*128*2
        # bytes per treelet — gate on the padded size.
        dyn_bytes = self.t_pad * treelet * 128 * 2
        self.rowdyn_ok = self.rowdense_ok and dyn_bytes <= (6 << 20)
        # HBM-resident variant ("dynhbm"): the same slot-major table kept
        # in HBM and DMA'd one treelet per round — no VMEM gate, so it
        # serves meshes far past the rowdense/rowdyn limits. Unpadded
        # footprint (3*nf lanes, not 128): gate only against a sane HBM
        # budget.
        dynh_bytes = self.t_pad * treelet * 3 * nf * 2
        self.rowdynh_ok = dynh_bytes <= (512 << 20)
        if self.rowdyn_ok or self.rowdynh_ok:
            # [n_chunks, 3*nf*treelet, CHUNK] -> [t_pad, treelet, 3*nf]
            tbl = np.asarray(self.table)
            self.table_dyn = jnp.asarray(
                np.ascontiguousarray(
                    tbl.transpose(1, 0, 2)
                    .reshape(3 * nf, treelet, self.t_pad)
                    .transpose(2, 1, 0)))
        else:
            self.table_dyn = None

    def _components(self, ray_batch):
        n = ray_batch.origin.shape[0]
        rows = -(-n // self.rays)
        rows = -(-rows // self.subrows) * self.subrows
        pad = rows * self.rays - n

        def prep(a, fill):
            a = jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
            return a.reshape(rows, self.rays)

        rays = ray_batch

        comps = [prep(rays.origin[:, i], 0.0) for i in range(3)]
        comps += [prep(rays.dir[:, i], 1.0) for i in range(3)]
        comps.append(prep(rays.t_max, -1.0))
        return comps, n

    def _sort_key(self, rays):
        """Spatial-coherence sort key: origin morton (6 bits/axis,
        interleaved) then direction octant+quadrant. Lanes that trace
        together should want the same treelets; dead rays (t_max <= 0)
        key to the end, compacting them into rows phase 1 skips whole."""
        lo, hi = self.world_bounds
        lo = jnp.asarray(lo)
        inv = 63.0 / jnp.maximum(jnp.asarray(hi) - lo, 1e-30)
        q = jnp.clip(((rays.origin - lo) * inv).astype(jnp.int32), 0, 63)

        def part1by2(x):
            # spread 6 bits to every 3rd position (morton component)
            x = (x | (x << 8)) & 0x0300F
            x = (x | (x << 4)) & 0x030C3
            x = (x | (x << 2)) & 0x09249
            return x

        morton = (part1by2(q[:, 0]) | (part1by2(q[:, 1]) << 1)
                  | (part1by2(q[:, 2]) << 2))  # 18 bits
        d = rays.dir
        octant = ((d[:, 0] < 0).astype(jnp.int32)
                  | ((d[:, 1] < 0).astype(jnp.int32) << 1)
                  | ((d[:, 2] < 0).astype(jnp.int32) << 2))
        ax = jnp.abs(d)
        major = jnp.argmax(ax, axis=1).astype(jnp.int32)
        key = (morton << 5) | (octant << 2) | major
        return jnp.where(rays.t_max > 0.0, key, jnp.int32(2**30))

    def trace(self, rays, any_hit=False, sort=False, mode=None):
        # sort: morton/octant ray reordering. Measured a net LOSS on v5e
        # for the per-lane kernels (XLA argsort + gathers cost more than
        # the round-count saving), but it makes rows coherent for the
        # row-dense mode, whose cost IS the row's treelet union.
        # mode: None/'onehot' per-lane gather kernels; 'rowdense' the
        # row-shared dense kernel (_rowdense_row) when the table fits;
        # 'rowdyn' the same row-shared traversal with the one-hot matmul
        # fetch replaced by a scalar-indexed dynamic load; 'rowdynh' the
        # HBM-resident variant (per-round DMA, no VMEM table gate). The
        # ladder degrades rowdyn -> dynhbm -> rowdense -> onehot as the
        # VMEM/HBM gates reject each layout.
        n = rays.origin.shape[0]
        if sort:
            perm = jnp.argsort(self._sort_key(rays))
            rays = rays.replace(
                origin=rays.origin[perm], dir=rays.dir[perm],
                t_max=rays.t_max[perm])
        comps, n = self._components(rays)
        if mode == "rowdyn" and self.rowdyn_ok:
            t, packed = _trace_blocks_rowdense(
                self.boxes, self.cboxes, self.table_dyn, tuple(comps),
                kind=self.kind, t_pad=self.t_pad, t_count=self.t_count,
                nf=N_FIELDS[self.kind], treelet=self.treelet,
                any_hit=any_hit, rays=self.rays, subrows=self.subrows,
                fetch="dyn", interpret=self.interpret)
        elif mode in ("rowdyn", "rowdynh") and self.rowdynh_ok:
            # VMEM table gate failed (or dynhbm explicitly requested):
            # same traversal, HBM-resident table, per-round DMA fetch.
            t, packed = _trace_blocks_rowdense(
                self.boxes, self.cboxes, self.table_dyn, tuple(comps),
                kind=self.kind, t_pad=self.t_pad, t_count=self.t_count,
                nf=N_FIELDS[self.kind], treelet=self.treelet,
                any_hit=any_hit, rays=self.rays, subrows=self.subrows,
                fetch="dynhbm", interpret=self.interpret)
        elif mode in ("rowdense", "rowdyn", "rowdynh") and self.rowdense_ok:
            t, packed = _trace_blocks_rowdense(
                self.boxes, self.cboxes, self.table_flat, tuple(comps),
                kind=self.kind, t_pad=self.t_pad, t_count=self.t_count,
                nf=N_FIELDS[self.kind], treelet=self.treelet,
                any_hit=any_hit, rays=self.rays, subrows=self.subrows,
                interpret=self.interpret)
        else:
            t, packed = _trace_blocks(
                self.boxes, self.cboxes, self.table, tuple(comps),
                kind=self.kind, n_chunks=self.n_chunks,
                t_count=self.t_count,
                nf=N_FIELDS[self.kind], treelet=self.treelet,
                any_hit=any_hit, rays=self.rays, subrows=self.subrows,
                resident=self.resident, interpret=self.interpret)
        t = t.reshape(-1)[:n]
        packed = packed.reshape(-1)[:n]
        # (treelet, slot) -> global prim id; a small XLA gather outside the
        # kernel (keeping the id out of the in-kernel field tables).
        idx = jnp.where(
            packed >= 0,
            jnp.take(self.slot_gid, jnp.clip(packed, 0), axis=0), -1)
        if sort:
            t = jnp.zeros_like(t).at[perm].set(t)
            idx = jnp.zeros_like(idx).at[perm].set(idx)
        return t, idx


def tri_tracer(p0, p1, p2, global_base, interpret=False, treelet=TREELET,
               **kw):
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
    return TreeletTracer(KIND_TRI, _tri_fields(p0, p1, p2), lo, hi,
                         global_base, interpret=interpret, treelet=treelet,
                         **kw)


def sphere_tracer(c, r, global_base, interpret=False, treelet=TREELET,
                  **kw):
    c = np.asarray(c, np.float32)
    r = np.asarray(r, np.float32)
    lo, hi = c - r[:, None], c + r[:, None]
    return TreeletTracer(KIND_SPHERE, _sphere_fields(c, r), lo, hi,
                         global_base, interpret=interpret, treelet=treelet,
                         **kw)


def quad_tracer(o, u, v, global_base, interpret=False, treelet=TREELET,
                **kw):
    o = np.asarray(o, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    corners = np.stack([o, o + u, o + v, o + u + v])
    return TreeletTracer(KIND_QUAD, _quad_fields(o, u, v),
                         corners.min(0), corners.max(0),
                         global_base, interpret=interpret, treelet=treelet,
                         **kw)


def disk_tracer(c, n, radial, global_base, interpret=False, treelet=TREELET,
                **kw):
    c = np.asarray(c, np.float32)
    n = np.asarray(n, np.float32)
    radial = np.asarray(radial, np.float32)
    r = np.sqrt((radial * radial).sum(1, keepdims=True))
    return TreeletTracer(KIND_DISK, _disk_fields(c, n, radial),
                         c - r, c + r, global_base,
                         interpret=interpret, treelet=treelet, **kw)
