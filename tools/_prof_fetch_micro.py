"""Microbenchmark: what does a row-dense treelet ROUND actually cost?

Round-4 VERDICT #1 hypothesized the rowdense ceiling is the one-hot
matmul fetch ([3F*64, t_pad] x [t_pad, 1]) and prescribed a
scalar-indexed dynamic fetch. Round 5 built that ('rowdyn') — this tool
isolates the per-round cost of each variant so ARCHITECTURE §10 can
carry a measured verdict instead of a hypothesis.

Method: trace the same ray batches in rowdense and rowdyn with
debug_rounds=True (the kernel then reports rounds/row instead of t),
time the normal kernels on the same batches, and divide: ms/round/row.
The two kernels share every instruction except the fetch, so the
difference IS the fetch-cost delta. A third measurement rules the
bookkeeping in/out: rays with t_max<=0 skip all rounds, so an all-dead
batch gives the fixed per-row cost.

Run: python tools/_prof_fetch_micro.py [levels]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _chip_health  # noqa: F401
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from pbrs_tpu.accel import treelet as tl
from pbrs_tpu.accel import trace_pallas as tp
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets

levels = int(_sys.argv[1]) if len(_sys.argv) > 1 else 5
scene = presets.mesh_ball(levels=levels)
tracer = tp.PallasTracer(scene.geom)
bvh = tracer.mesh
print(f"tris levels={levels}: t_count={bvh.t_count} t_pad={bvh.t_pad} "
      f"rowdense_ok={bvh.rowdense_ok} rowdyn_ok={bvh.rowdyn_ok}",
      flush=True)

# Camera rays in Morton order (coherent rows) + a scrambled copy.
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod

order = wavefront.morton_pixel_order(scene.camera.width,
                                     scene.camera.height)
n = min(1 << 19, len(order))  # cap at the frame's pixel count
pix = jnp.asarray(order[:n])
sampler = smp.PCGSampler(0)
rays_c = jax.jit(lambda: wavefront.camera_rays(
    scene, sampler, pix, 0, 2))()
perm = jnp.asarray(np.random.default_rng(0).permutation(n))
rays_i = ray_mod.RayBatch(origin=rays_c.origin[perm],
                          dir=rays_c.dir[perm], t_max=rays_c.t_max[perm])
rays_dead = rays_c.replace(t_max=jnp.zeros(n, jnp.float32))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, out


def rounds_of(mode, rays):
    """Mean rounds per 1024-lane row (debug_rounds encodes rounds*100)."""
    comps, _ = bvh._components(rays)
    fetch = {"rowdense": "onehot", "rowdyn": "dyn",
             "rowdynh": "dynhbm"}[mode]
    t, _ = tl._trace_blocks_rowdense(
        bvh.boxes, bvh.cboxes,
        bvh.table_flat if mode == "rowdense" else bvh.table_dyn,
        tuple(comps), kind=bvh.kind, t_pad=bvh.t_pad, t_count=bvh.t_count,
        nf=tl.N_FIELDS[bvh.kind], treelet=bvh.treelet,
        fetch=fetch, debug_rounds=True)
    per_row = np.asarray(t)[:, 0] / 100.0
    return float(per_row.mean())


for label, rays in (("coherent", rays_c), ("scrambled", rays_i)):
    rows = -(-n // tl.RAYS)
    base_ms = None
    for mode in ("rowdense", "rowdyn", "rowdynh"):
        if mode == "rowdyn" and not bvh.rowdyn_ok:
            continue
        if mode == "rowdynh" and not bvh.rowdynh_ok:
            continue
        fn = jax.jit(lambda r, m=mode: bvh.trace(r, mode=m))
        ms, (t, idx) = timeit(fn, rays)
        ms_dead, _ = timeit(jax.jit(
            lambda r, m=mode: bvh.trace(r, mode=m)), rays_dead)
        rnds = rounds_of(mode, rays)
        per_round_us = (ms - ms_dead) / max(rows * rnds, 1e-9) * 1e3
        print(f"[{label}] {mode:9s} {ms:8.2f} ms  fixed {ms_dead:6.2f} ms  "
              f"{rnds:6.1f} rounds/row  -> {per_round_us:6.2f} us/round "
              f"({n / ms / 1e3:.1f} Mrays/s)", flush=True)
        if base_ms is None:
            base_ms = ms
        else:
            print(f"[{label}] fetch delta ({mode} - rowdense): "
                  f"{ms - base_ms:+.2f} ms "
                  f"({(ms - base_ms) / base_ms * 100:+.1f}%)", flush=True)

# Per-lane one-hot for reference on the same batches.
for label, rays in (("coherent", rays_c), ("scrambled", rays_i)):
    fn = jax.jit(lambda r: bvh.trace(r))
    ms, _ = timeit(fn, rays)
    print(f"[{label}] onehot    {ms:8.2f} ms ({n / ms / 1e3:.1f} Mrays/s)",
          flush=True)
