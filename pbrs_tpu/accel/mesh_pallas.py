"""Pallas packet BVH traversal over primitive BVHs (triangles, quads,
spheres, disks — one single-type BVH per primitive family).

The reference walks a recursive BVH per ray with an explicit node stack
(reference shape/src/blas.rs:422-476). On TPU, per-lane stacks and node
fetches don't vectorize, so this kernel runs *packet traversal*: one
tile-uniform node pointer walks the flattened DFS order; the bbox slab test
runs on all lanes at once, a scalar any-hit reduction decides descend vs
skip (the threaded "miss link" from accel/bvh.py). Ray coherence within a
tile is what makes this fast — camera and shadow batches are coherent;
incoherent bounce batches degrade toward a full sweep.

Storage layout is dictated by Mosaic's addressing rules: node components
are 1-D SMEM arrays (scalar loads with dynamic index); leaf triangles are
packed NINE-PER-ROW into a [num_leaves, 128] VMEM matrix (9 tris x 13
floats = 117 lanes), so every triangle fetch is a dynamic-sublane /
static-lane scalar read — the only dynamic-index pattern the TPU supports
without a gather.
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

LANES = 128
BLOCK_ROWS = 32
T_MIN = ray_mod.T_MIN
BIG = 3.0e38

_NODE_FIELDS = 10  # bmin xyz, bmax xyz, is_leaf, first(leaf row), count, skip
TRIS_PER_LEAF = 9  # 9 prims x 13 floats = 117 <= 128 lanes per leaf row
# Primitive families (slot layout: 12 floats + gid):
#   TRI:    p0(3) p1(3) p2(3) plane-normal(3)
#   QUAD:   origin(3) edge_u(3) edge_v(3) normal(3)   (n2 recomputed)
#   SPHERE: center(3) radius _ _ ...
#   DISK:   center(3) normal(3) r2 _ ...
KIND_TRI, KIND_QUAD, KIND_SPHERE, KIND_DISK = 0, 1, 2, 3


def tri_slot_cols(p0, p1, p2, gid):
    n = np.cross(p0 - p1, p2 - p1)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(ln > 0, n / np.maximum(ln, 1e-30), 0.0)
    return np.concatenate(
        [p0, p1, p2, n, gid[:, None]], axis=1
    ).astype(np.float32)


def quad_slot_cols(origin, eu, ev, gid):
    n = np.cross(eu, ev)
    return np.concatenate(
        [origin, eu, ev, n, gid[:, None]], axis=1
    ).astype(np.float32)


def sphere_slot_cols(center, radius, gid):
    z = np.zeros((center.shape[0], 1), np.float32)
    return np.concatenate(
        [center, radius[:, None], z, z, z, z, z, z, z, z, gid[:, None]],
        axis=1,
    ).astype(np.float32)


def disk_slot_cols(center, normal, radial, gid):
    r2 = (radial * radial).sum(1, keepdims=True)
    z = np.zeros((center.shape[0], 1), np.float32)
    return np.concatenate(
        [center, normal, r2, z, z, z, z, z, gid[:, None]], axis=1
    ).astype(np.float32)


def pack_mesh(bvh: bvh_mod.FlatBVH, slot_cols, global_base: int):
    """Node component arrays (SMEM) + leaf-row primitive matrix (VMEM).

    Leaf row layout: prim j occupies lanes [13j, 13j+13). Padding slots
    carry zero normals/radii (can never hit). Requires every leaf to have
    <= TRIS_PER_LEAF prims. slot_cols: [P, 13] in ORIGINAL prim order; the
    gid column already includes global_base."""
    order = bvh.prim_order
    tri_cols = np.asarray(slot_cols, np.float32)[order]

    leaf_ids = np.where(bvh.is_leaf > 0)[0]
    num_leaves = len(leaf_ids)
    leaf_rows = np.zeros((max(num_leaves, 1), 128), np.float32)
    leaf_row_of_node = np.zeros(bvh.is_leaf.shape[0], np.int32)
    for row, node in enumerate(leaf_ids):
        f, c = bvh.first[node], bvh.count[node]
        assert c <= TRIS_PER_LEAF, "rebuild BVH with max_leaf <= 9"
        leaf_row_of_node[node] = row
        block = tri_cols[f:f + c].reshape(-1)
        leaf_rows[row, :block.size] = block

    node_arrays = [
        jnp.asarray(bvh.bbox_min[:, 0]), jnp.asarray(bvh.bbox_min[:, 1]),
        jnp.asarray(bvh.bbox_min[:, 2]),
        jnp.asarray(bvh.bbox_max[:, 0]), jnp.asarray(bvh.bbox_max[:, 1]),
        jnp.asarray(bvh.bbox_max[:, 2]),
        jnp.asarray(bvh.is_leaf), jnp.asarray(leaf_row_of_node),
        jnp.asarray(bvh.count), jnp.asarray(bvh.skip),
    ]
    return node_arrays, jnp.asarray(leaf_rows)


def _bvh_kernel(*refs, num_nodes, any_hit, kind=KIND_TRI):
    (nbx, nby, nbz, nBx, nBy, nBz, nleaf, nrow, ncount, nskip) = refs[:10]
    leaf_rows = refs[10]
    ox, oy, oz, dx, dy, dz, tmax = refs[11:18]
    t_out, idx_out = refs[18:20]

    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    t_max = tmax[...]
    inv_x = 1.0 / jnp.where(rdx == 0.0, 1e-30, rdx)
    inv_y = 1.0 / jnp.where(rdy == 0.0, 1e-30, rdy)
    inv_z = 1.0 / jnp.where(rdz == 0.0, 1e-30, rdz)

    t_best0 = jnp.full(rox.shape, BIG, jnp.float32)
    idx0 = jnp.full(rox.shape, -1, jnp.int32)

    def tri_test(row, j, t_best, idx_best):
        # Static lane offsets within the leaf row; dynamic sublane `row`.
        c = lambda k: leaf_rows[row, j * 13 + k]
        gid = c(12).astype(jnp.int32)
        if kind == KIND_SPHERE:
            cx, cy, cz, r = c(0), c(1), c(2), c(3)
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
                jnp.maximum(delta * a, 0.0)
            )
            q_s = jnp.where(q == 0.0, 1.0, q)
            t0 = cc / q_s
            t1 = q * inv_a
            t_lo = jnp.minimum(t0, t1)
            t_hi = jnp.maximum(t0, t1)
            ok0 = (delta >= 0.0) & (q != 0.0)
            lo_ok = ok0 & (t_lo >= T_MIN) & (t_lo < t_max)
            t = jnp.where(lo_ok, t_lo, t_hi)
            ok = ok0 & (t >= T_MIN) & (t < t_max)
        elif kind == KIND_QUAD:
            ox_, oy_, oz_ = c(0), c(1), c(2)
            ux, uy, uz = c(3), c(4), c(5)
            vx, vy, vz = c(6), c(7), c(8)
            nx, ny, nz = c(9), c(10), c(11)
            n2 = jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
            denom = rdx * nx + rdy * ny + rdz * nz
            denom_s = jnp.where(denom == 0.0, 1.0, denom)
            t = ((ox_ - rox) * nx + (oy_ - roy) * ny
                 + (oz_ - roz) * nz) / denom_s
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
            ok = (
                (denom != 0.0) & (uu >= 0.0) & (uu <= 1.0)
                & (vv >= 0.0) & (vv <= 1.0)
                & (t >= T_MIN) & (t < t_max)
            )
        elif kind == KIND_DISK:
            cx_, cy_, cz_ = c(0), c(1), c(2)
            nx, ny, nz = c(3), c(4), c(5)
            r2 = c(6)
            denom = rdx * nx + rdy * ny + rdz * nz
            denom_s = jnp.where(denom == 0.0, 1.0, denom)
            t = ((cx_ - rox) * nx + (cy_ - roy) * ny
                 + (cz_ - roz) * nz) / denom_s
            hx = rox + t * rdx - cx_
            hy = roy + t * rdy - cy_
            hz = roz + t * rdz - cz_
            ok = (
                (denom != 0.0) & (hx * hx + hy * hy + hz * hz <= r2)
                & (t >= T_MIN) & (t < t_max)
            )
        else:  # KIND_TRI
            p0x, p0y, p0z = c(0), c(1), c(2)
            p1x, p1y, p1z = c(3), c(4), c(5)
            p2x, p2y, p2z = c(6), c(7), c(8)
            nx, ny, nz = c(9), c(10), c(11)
            denom = rdx * nx + rdy * ny + rdz * nz
            denom_s = jnp.where(denom == 0.0, 1.0, denom)
            t = ((p0x - rox) * nx + (p0y - roy) * ny
                 + (p0z - roz) * nz) / denom_s
            hx = rox + t * rdx
            hy = roy + t * rdy
            hz = roz + t * rdz

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
            ok = (denom != 0.0) & inside & (t >= T_MIN) & (t < t_max)
        t = jnp.where(ok, t, BIG)
        closer = t < t_best
        return (
            jnp.where(closer, t, t_best),
            jnp.where(closer, gid, idx_best),
        )

    def cond(state):
        node, t_best, idx_best, nstep = state
        live = node < num_nodes
        if any_hit:
            unresolved = jnp.sum((idx_best < 0).astype(jnp.float32)) > 0.0
            live = live & unresolved
        # Hard bound: in a well-formed BVH both successors (node+1 and the
        # skip pointer) are strictly greater than node, so the walk visits
        # each node at most once. The cap turns that invariant into a
        # hardware guarantee — a cyclic skip table (corruption/miscompile)
        # must terminate rather than wedge the shared chip.
        return live & (nstep < num_nodes + 1)

    def body(state):
        node, t_best, idx_best, nstep = state
        tx0 = (nbx[node] - rox) * inv_x
        tx1 = (nBx[node] - rox) * inv_x
        ty0 = (nby[node] - roy) * inv_y
        ty1 = (nBy[node] - roy) * inv_y
        tz0 = (nbz[node] - roz) * inv_z
        tz1 = (nBz[node] - roz) * inv_z
        t_enter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_exit = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        limit = jnp.minimum(t_best, t_max)
        hit = (t_enter <= t_exit) & (t_exit >= T_MIN) & (t_enter < limit)
        wanted = jnp.sum(hit.astype(jnp.float32)) > 0.0

        is_leaf = nleaf[node]
        row = nrow[node]
        skip = nskip[node]

        def do_leaf(carry):
            t_b, i_b = carry
            # Unrolled over the fixed leaf width; padding slots have zero
            # normals and never pass the plane test.
            for j in range(TRIS_PER_LEAF):
                t_b, i_b = tri_test(row, j, t_b, i_b)
            return t_b, i_b

        take_leaf = wanted & (is_leaf > 0)
        t_best, idx_best = jax.lax.cond(
            take_leaf, do_leaf, lambda c: c, (t_best, idx_best)
        )
        nxt = jnp.where(wanted & (is_leaf == 0), node + 1, skip)
        return nxt, t_best, idx_best, nstep + 1

    node0 = jnp.int32(0)
    _, t_best, idx_best, _ = jax.lax.while_loop(
        cond, body, (node0, t_best0, idx0, jnp.int32(0))
    )
    miss = t_best >= BIG
    t_out[...] = jnp.where(miss, jnp.inf, t_best)
    idx_out[...] = jnp.where(miss, -1, idx_best)


@functools.partial(jax.jit, static_argnames=("num_nodes", "any_hit",
                                             "interpret", "block_rows",
                                             "kind"))
def _traverse_padded(node_arrays, leaf_rows, ray_comps,
                     num_nodes, any_hit=False, interpret=False,
                     block_rows=BLOCK_ROWS, kind=KIND_TRI):
    rows = ray_comps[0].shape[0]
    grid = (rows // block_rows,)
    blk = lambda: pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bvh_kernel, num_nodes=num_nodes, any_hit=any_hit, kind=kind
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [smem() for _ in range(_NODE_FIELDS)]
            + [vmem()]
            + [blk() for _ in range(7)]
        ),
        out_specs=(blk(), blk()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(*node_arrays, leaf_rows, *ray_comps)


class PrimBVHTracer:
    """Closest-hit / any-hit over a single-type primitive BVH."""

    def __init__(self, kind, slot_cols, bbox_lo, bbox_hi, interpret=False,
                 max_leaf=TRIS_PER_LEAF, block_rows=BLOCK_ROWS):
        assert max_leaf <= TRIS_PER_LEAF
        self.kind = kind
        self.block_rows = block_rows
        self.bvh = bvh_mod.build_bvh(bbox_lo, bbox_hi, max_leaf=max_leaf)
        self.node_arrays, self.leaf_rows = pack_mesh(
            self.bvh, slot_cols, 0
        )
        self.num_nodes = int(self.node_arrays[0].shape[0])
        self.interpret = interpret

    def _components(self, rays):
        n = rays.origin.shape[0]
        rows = -(-n // LANES)
        rows = -(-rows // self.block_rows) * self.block_rows
        pad = rows * LANES - n

        def prep(a, fill):
            a = jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
            return a.reshape(rows, LANES)

        comps = [prep(rays.origin[:, i], 0.0) for i in range(3)]
        comps += [prep(rays.dir[:, i], 1.0) for i in range(3)]
        comps.append(prep(rays.t_max, -1.0))
        return comps, n

    def trace(self, rays, any_hit=False, sort_rays=True):
        """sort_rays: order lanes by (direction octant, origin cell) so
        packets are coherent — ~1.4x on incoherent bounce batches."""
        if sort_rays:
            o, d = rays.origin, rays.dir
            octant = (
                (d[:, 0] > 0).astype(jnp.uint32)
                | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                | ((d[:, 2] > 0).astype(jnp.uint32) << 2)
            )
            lo = jnp.min(o, axis=0)
            span = jnp.maximum(jnp.max(o, axis=0) - lo, 1e-6)
            cell = jnp.clip(((o - lo) / span * 7).astype(jnp.uint32), 0, 7)
            key = (
                (octant << jnp.uint32(9)) | (cell[:, 0] << jnp.uint32(6))
                | (cell[:, 1] << jnp.uint32(3)) | cell[:, 2]
            )
            order = jnp.argsort(key)
            rays = ray_mod.RayBatch(
                origin=rays.origin[order], dir=rays.dir[order],
                t_max=rays.t_max[order],
            )
        comps, n = self._components(rays)
        t, idx = _traverse_padded(
            tuple(self.node_arrays), self.leaf_rows, tuple(comps),
            num_nodes=self.num_nodes, any_hit=any_hit,
            interpret=self.interpret, block_rows=self.block_rows,
            kind=self.kind,
        )
        t, idx = t.reshape(-1)[:n], idx.reshape(-1)[:n]
        if sort_rays:
            inv = jnp.argsort(order)
            t, idx = t[inv], idx[inv]
        return t, idx


class MeshBVHTracer(PrimBVHTracer):
    """Triangle-BVH tracer (compat wrapper over PrimBVHTracer)."""

    def __init__(self, p0, p1, p2, global_base: int, interpret=False,
                 max_leaf=TRIS_PER_LEAF, block_rows=BLOCK_ROWS):
        p0 = np.asarray(p0, np.float32)
        p1 = np.asarray(p1, np.float32)
        p2 = np.asarray(p2, np.float32)
        gid = (global_base + np.arange(p0.shape[0])).astype(np.float32)
        lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
        super().__init__(
            KIND_TRI, tri_slot_cols(p0, p1, p2, gid), lo, hi,
            interpret=interpret, max_leaf=max_leaf, block_rows=block_rows,
        )
