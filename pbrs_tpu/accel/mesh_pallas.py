"""Pallas packet BVH traversal for triangle meshes.

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
TRIS_PER_LEAF = 9  # 9 tris x 13 floats = 117 <= 128 lanes per leaf row


def pack_mesh(bvh: bvh_mod.FlatBVH, p0, p1, p2, global_base: int):
    """Node component arrays (SMEM) + leaf-row triangle matrix (VMEM).

    Leaf row layout: tri j occupies lanes [13j, 13j+13): p0, p1, p2, plane
    normal, gid-as-float. Padding slots carry zero normals (can never hit).
    Requires every leaf to have <= TRIS_PER_LEAF prims."""
    order = bvh.prim_order
    p0o, p1o, p2o = p0[order], p1[order], p2[order]
    n = np.cross(p0o - p1o, p2o - p1o)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(ln > 0, n / np.maximum(ln, 1e-30), 0.0)
    gid = (global_base + order).astype(np.float32)
    tri_cols = np.concatenate(
        [p0o, p1o, p2o, n, gid[:, None]], axis=1
    ).astype(np.float32)  # [F, 13] in leaf order

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


def _bvh_kernel(*refs, num_nodes, any_hit):
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
        p0x, p0y, p0z = c(0), c(1), c(2)
        p1x, p1y, p1z = c(3), c(4), c(5)
        p2x, p2y, p2z = c(6), c(7), c(8)
        nx, ny, nz = c(9), c(10), c(11)
        gid = c(12).astype(jnp.int32)
        denom = rdx * nx + rdy * ny + rdz * nz
        denom_s = jnp.where(denom == 0.0, 1.0, denom)
        t = ((p0x - rox) * nx + (p0y - roy) * ny + (p0z - roz) * nz) / denom_s
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
        node, t_best, idx_best = state
        live = node < num_nodes
        if any_hit:
            unresolved = jnp.sum((idx_best < 0).astype(jnp.float32)) > 0.0
            live = live & unresolved
        return live

    def body(state):
        node, t_best, idx_best = state
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
        return nxt, t_best, idx_best

    node0 = jnp.int32(0)
    _, t_best, idx_best = jax.lax.while_loop(
        cond, body, (node0, t_best0, idx0)
    )
    miss = t_best >= BIG
    t_out[...] = jnp.where(miss, jnp.inf, t_best)
    idx_out[...] = jnp.where(miss, -1, idx_best)


@functools.partial(jax.jit, static_argnames=("num_nodes", "any_hit",
                                             "interpret", "block_rows"))
def _traverse_padded(node_arrays, leaf_rows, ray_comps,
                     num_nodes, any_hit=False, interpret=False,
                     block_rows=BLOCK_ROWS):
    rows = ray_comps[0].shape[0]
    grid = (rows // block_rows,)
    blk = lambda: pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bvh_kernel, num_nodes=num_nodes, any_hit=any_hit
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


class MeshBVHTracer:
    """Closest-hit / any-hit over a triangle BVH (global tri indices)."""

    def __init__(self, p0, p1, p2, global_base: int, interpret=False,
                 max_leaf=TRIS_PER_LEAF, block_rows=BLOCK_ROWS):
        assert max_leaf <= TRIS_PER_LEAF
        p0 = np.asarray(p0, np.float32)
        p1 = np.asarray(p1, np.float32)
        p2 = np.asarray(p2, np.float32)
        self.block_rows = block_rows
        lo, hi = bvh_mod.triangle_bboxes(p0, p1, p2)
        self.bvh = bvh_mod.build_bvh(lo, hi, max_leaf=max_leaf)
        self.node_arrays, self.leaf_rows = pack_mesh(
            self.bvh, p0, p1, p2, global_base
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

    def trace(self, rays, any_hit=False):
        comps, n = self._components(rays)
        t, idx = _traverse_padded(
            tuple(self.node_arrays), self.leaf_rows, tuple(comps),
            num_nodes=self.num_nodes, any_hit=any_hit,
            interpret=self.interpret, block_rows=self.block_rows,
        )
        return t.reshape(-1)[:n], idx.reshape(-1)[:n]
