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
    t, idx = f(rays); t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6

bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
for tsize in (128, 256):
    tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh,
                          0, treelet=tsize)
    mc = bench(tr, rays_c); mi = bench(tr, rays_i)
    print(f"treelet={tsize}: t_count={tr.t_count} chunks={tr.n_chunks} "
          f"resident={tr.resident} coherent {mc:.1f} incoherent {mi:.1f}",
          flush=True)
