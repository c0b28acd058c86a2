"""Treelet tracer diagnostics: rounds/row distribution + per-round cost.

Q1: how many gather rounds does each 1024-lane row run (mean/max), vs the
    mean treelet visits a single ray needs?
Q2: what does one round cost (MXU matmul at kernel shape, measured alone)?
Together these give the roofline: rays/s = 1024 / (rounds_row * t_round).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from pbrs_tpu.scene import presets
from pbrs_tpu.accel import treelet as tl
from pbrs_tpu.accel import bvh as bvh_mod
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront

scene = presets.mesh_ball(levels=5)
g = scene.geom
p0 = np.asarray(g.tri_p0); p1 = np.asarray(g.tri_p1); p2 = np.asarray(g.tri_p2)
print("tris:", p0.shape[0], flush=True)
N = 1 << 20
sampler = smp.PCGSampler(0)
pix = jnp.arange(N, dtype=jnp.int32) % (800 * 600)
rays_c = wavefront.camera_rays(scene, sampler, pix, jnp.zeros(N, jnp.int32), 2)
key = jax.random.PRNGKey(1)
k1, k2 = jax.random.split(key)
lo = p0.min(0); hi = p0.max(0)
ctr = (lo + hi) / 2; ext = hi - lo
orig = jax.random.uniform(k1, (N, 3)) * ext * 2 + (ctr - ext)
d = jax.random.normal(k2, (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
rays_i = ray_mod.RayBatch(origin=orig.astype(jnp.float32),
                          dir=d.astype(jnp.float32),
                          t_max=jnp.full(N, 3e38, jnp.float32))

bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh, 0)
print(f"t_count={tr.t_count} chunks={tr.n_chunks} resident={tr.resident}",
      flush=True)

# Q1: rounds per row (debug_rounds: t = nround*100 + nchunk per row)
from pbrs_tpu.accel.treelet import _trace_blocks, N_FIELDS
def rounds_stats(rays, name):
    comps, n = tr._components(rays)
    t, idx = _trace_blocks(
        tr.boxes, tr.cboxes, tr.table, tuple(comps), kind=tr.kind,
        n_chunks=tr.n_chunks, t_count=tr.t_count, nf=N_FIELDS[tr.kind],
        treelet=tr.treelet, any_hit=False, rays=tr.rays,
        subrows=tr.subrows, resident=tr.resident, debug_rounds=True)
    enc = np.asarray(t)[:, 0]  # per row: nround*100 + nchunk
    rounds = enc // 100
    chunks = enc % 100
    print(f"{name}: rows={len(rounds)} rounds mean={rounds.mean():.1f} "
          f"p50={np.percentile(rounds,50):.0f} p90={np.percentile(rounds,90):.0f} "
          f"max={rounds.max():.0f}; chunks mean={chunks.mean():.2f}",
          flush=True)

rounds_stats(rays_c, "coherent")
rounds_stats(rays_i, "incoherent")

# Q2: bare matmul at the kernel's gather shape, amortized over many reps
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS3 = 3 * 9 * 64  # 1728
def mm_kernel(tab_ref, oh_ref, out_ref, *, reps):
    acc = jnp.zeros((ROWS3, 1024), jnp.float32)
    def body(i, acc):
        g = jax.lax.dot_general(
            tab_ref[...], oh_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        return acc + g
    acc = jax.lax.fori_loop(0, reps, body, acc)
    out_ref[...] = acc

@functools.partial(jax.jit, static_argnames=("reps",))
def mm_bench(tab, oh, reps):
    return pl.pallas_call(
        functools.partial(mm_kernel, reps=reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS3, 1024), jnp.float32),
    )(tab, oh)

tab = jnp.asarray(np.random.randn(ROWS3, 128), jnp.bfloat16)
oh = jnp.asarray((np.random.rand(128, 1024) < 0.01), jnp.bfloat16)
for reps in (100, 400):
    r = mm_bench(tab, oh, reps); r.block_until_ready()
    t0 = time.time()
    r = mm_bench(tab, oh, reps); r.block_until_ready()
    dt = time.time() - t0
    macs = ROWS3 * 128 * 1024 * reps
    print(f"matmul reps={reps}: {dt/reps*1e6:.2f} us/round "
          f"({macs/dt/1e12:.1f} TMAC/s)", flush=True)

# Q3: end-to-end trace timing now
def bench(rays, name, reps=4):
    f = jax.jit(lambda r: tr.trace(r))
    t, idx = f(rays); t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name}: {N/dt/1e6:.1f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)

bench(rays_c, "trace coherent")
bench(rays_i, "trace incoherent")
