"""Profile the treelet tracer on TPU: rounds, chunks, time per round."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from pbrs_tpu.scene import presets
from pbrs_tpu.accel import treelet as tl
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront

scene = presets.mesh_ball(levels=5)
g = scene.geom
p0 = np.asarray(g.tri_p0); p1 = np.asarray(g.tri_p1); p2 = np.asarray(g.tri_p2)
print("tris:", p0.shape[0])

tracer = tl.tri_tracer(p0, p1, p2, 0)
print("treelets:", tracer.t_count, "chunks:", tracer.n_chunks,
      "resident:", tracer.resident)

# coherent camera rays
N = 1 << 20
sampler = smp.PCGSampler(0)
pix = jnp.arange(N, dtype=jnp.int32) % (800 * 600)
rays = wavefront.camera_rays(scene, sampler, pix, jnp.zeros(N, jnp.int32), 2)

# incoherent rays: random origins in the bbox shell, random dirs
key = jax.random.PRNGKey(1)
k1, k2 = jax.random.split(key)
lo, hi = tracer.world_bounds
ctr = (np.asarray(lo) + np.asarray(hi)) / 2
ext = (np.asarray(hi) - np.asarray(lo))
orig = jax.random.uniform(k1, (N, 3)) * ext * 2 + (ctr - ext)
d = jax.random.normal(k2, (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
rays_inc = ray_mod.RayBatch(origin=orig.astype(jnp.float32),
                            dir=d.astype(jnp.float32),
                            t_max=jnp.full(N, 3e38, jnp.float32))


def bench(name, rays, any_hit=False):
    f = jax.jit(lambda r: tracer.trace(r, any_hit=any_hit))
    t, idx = f(rays)
    t.block_until_ready()
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    dt = (time.time() - t0) / reps
    hitrate = float(jnp.mean(jnp.isfinite(t)))
    print(f"{name}: {N/dt/1e6:.2f} Mrays/s  ({dt*1e3:.2f} ms, hit {hitrate:.2f})")
    return dt


dt_c = bench("coherent closest", rays)
dt_i = bench("incoherent closest", rays_inc)
dt_a = bench("coherent any-hit", rays, any_hit=True)

# round counts via debug_rounds
from pbrs_tpu.accel.treelet import _trace_blocks, N_FIELDS

comps, n = tracer._components(rays)
t_dbg, _ = _trace_blocks(tracer.boxes, tracer.cboxes, tracer.table, tuple(comps),
                         kind=tracer.kind, n_chunks=tracer.n_chunks,
                         t_count=tracer.t_count, nf=N_FIELDS[tracer.kind],
                         treelet=tracer.treelet, any_hit=False,
                         resident=tracer.resident, debug_rounds=True)
t_dbg = np.asarray(t_dbg)
rounds = t_dbg // 100
chunks = t_dbg % 100
print("coherent rounds/row: mean %.1f max %.0f; chunks: mean %.1f" % (
    rounds.mean(), rounds.max(), chunks.mean()))

comps, n = tracer._components(rays_inc)
t_dbg, _ = _trace_blocks(tracer.boxes, tracer.cboxes, tracer.table, tuple(comps),
                         kind=tracer.kind, n_chunks=tracer.n_chunks,
                         t_count=tracer.t_count, nf=N_FIELDS[tracer.kind],
                         treelet=tracer.treelet, any_hit=False,
                         resident=tracer.resident, debug_rounds=True)
t_dbg = np.asarray(t_dbg)
rounds = t_dbg // 100
chunks = t_dbg % 100
print("incoherent rounds/row: mean %.1f max %.0f; chunks mean %.1f" % (
    rounds.mean(), rounds.max(), chunks.mean()))

# raw matmul microbench at the gather shape: [3*9*64, 128] x [128, 1024]
a = jnp.zeros((3 * 9 * 64, 128), jnp.bfloat16)
b = jnp.zeros((128, 1024), jnp.bfloat16)


@jax.jit
def mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

r = mm(a, b); r.block_until_ready()
reps = 200
t0 = time.time()
for _ in range(reps):
    r = mm(a, b)
r.block_until_ready()
dt = (time.time() - t0) / reps
macs = a.shape[0] * a.shape[1] * b.shape[1]
print(f"gather matmul alone: {dt*1e6:.1f} us ({macs/dt/1e12:.1f} TMAC/s)")
