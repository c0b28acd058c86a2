"""Treelet parameter sweep + gather microbenches on TPU."""
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


def bench(tracer, rays, reps=4):
    f = jax.jit(lambda r: tracer.trace(r))
    t, idx = f(rays)
    t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6


for tsize in (64, 32, 16):
    for unroll in (2, 4):
        tl.UNROLL = unroll
        tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2),
                              *__import__('pbrs_tpu.accel.bvh', fromlist=['x']
                                          ).triangle_bboxes(p0, p1, p2),
                              0, treelet=tsize)
        mc = bench(tr, rays_c)
        mi = bench(tr, rays_i)
        print(f"treelet={tsize} unroll={unroll}: t_count={tr.t_count} "
              f"chunks={tr.n_chunks} coherent {mc:.1f} incoherent {mi:.1f}",
              flush=True)
tl.UNROLL = 2

# ---- XLA wide row gather microbench (detail-plane cost for fused_wave) ----
P = 5632
table = jnp.asarray(np.random.rand(P, 32).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, P, N), jnp.int32)


@jax.jit
def wide_gather(t, i):
    return t[i]

r = wide_gather(table, idx); r.block_until_ready()
t0 = time.time()
for _ in range(10):
    r = wide_gather(table, idx)
r.block_until_ready()
dt = (time.time() - t0) / 10
print(f"XLA wide gather [1M from {P}x32]: {dt*1e3:.2f} ms "
      f"({N*32*4/dt/1e9:.0f} GB/s)", flush=True)

# single-field gather for comparison
tf1 = jnp.asarray(np.random.rand(P).astype(np.float32))


@jax.jit
def field_gather(t, i):
    return t[i]

r = field_gather(tf1, idx); r.block_until_ready()
t0 = time.time()
for _ in range(10):
    r = field_gather(tf1, idx)
r.block_until_ready()
print(f"XLA 1-field gather [1M from {P}]: {(time.time()-t0)/10*1e3:.2f} ms",
      flush=True)

# equirect env eval cost (outside-kernel plan)
img = jnp.asarray(np.random.rand(256, 512, 3).astype(np.float32))
dirs = jnp.asarray(np.random.randn(N, 3).astype(np.float32))


@jax.jit
def env_eval(img, d):
    from pbrs_tpu.lights import lights as lt
    env = lt.EnvLight(kind=lt.ENV_IMAGE, color_a=jnp.zeros(3),
                      color_b=jnp.zeros(3), image=img, scale=jnp.ones(3))
    return lt.eval_env(env, d)

r = env_eval(img, dirs); r.block_until_ready()
t0 = time.time()
for _ in range(10):
    r = env_eval(img, dirs)
r.block_until_ready()
print(f"env image eval [1M]: {(time.time()-t0)/10*1e3:.2f} ms", flush=True)
