"""Sequential TPU queue: tiny rowdense smoke -> raw probe -> interior A/B.

Run only when the chip is healthy. Every stage prints immediately.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from pbrs_tpu.accel import bvh as bvh_mod
from pbrs_tpu.accel import treelet as tl
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import ray as ray_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets

print("devices:", jax.devices(), flush=True)

# ---- stage 0: tiny rowdense smoke (bounded loop guard active) ----------
scene = presets.mesh_ball(levels=5)
g = scene.geom
p0 = np.asarray(g.tri_p0)
p1 = np.asarray(g.tri_p1)
p2 = np.asarray(g.tri_p2)
bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh, 0)
print(f"t_count={tr.t_count} n_chunks={tr.n_chunks}", flush=True)

W, H = 800, 600
sampler = smp.PCGSampler(0)
order = wavefront.morton_pixel_order(W, H)
N = 1 << 20
pix_mort = np.concatenate([order, order[:N - W * H]])
rays_m = wavefront.camera_rays(scene, sampler, jnp.asarray(pix_mort),
                               jnp.zeros(N, jnp.int32), 2)
sub = ray_mod.RayBatch(origin=rays_m.origin[:8192], dir=rays_m.dir[:8192],
                       t_max=rays_m.t_max[:8192])
t0 = time.time()
t2, i2 = jax.jit(lambda r: tr.trace(r, mode="rowdense"))(sub)
t2.block_until_ready()
print(f"smoke rowdense closest: {time.time()-t0:.1f}s", flush=True)
t1, i1 = jax.jit(lambda r: tr.trace(r))(sub)
t1, i1, t2, i2 = map(np.asarray, (t1, i1, t2, i2))
print("smoke exact:", int(np.sum(i1 != i2)), "idx mismatches", flush=True)

# ---- stage 1: raw probe, morton order ----------------------------------
def bench(fn, rays, reps=4):
    f = jax.jit(fn)
    t0 = time.time()
    t, idx = f(rays)
    t.block_until_ready()
    print(f"  (compile+1run {time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6

m = bench(lambda r: tr.trace(r, mode="rowdense"), rays_m)
print(f"morton rowdense closest: {m:.1f} Mrays/s", flush=True)
ma = bench(lambda r: tr.trace(r, mode="rowdense", any_hit=True), rays_m)
print(f"morton rowdense anyhit:  {ma:.1f} Mrays/s", flush=True)
mo = bench(lambda r: tr.trace(r), rays_m)
print(f"morton onehot closest:   {mo:.1f} Mrays/s", flush=True)

# incoherent batch for the degradation check
key = jax.random.PRNGKey(1)
k1, k2 = jax.random.split(key)
lo = p0.min(0)
hi = p0.max(0)
ctr = (lo + hi) / 2
ext = hi - lo
orig2 = jax.random.uniform(k1, (N, 3)) * ext * 2 + (ctr - ext)
d2 = jax.random.normal(k2, (N, 3))
d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
rays_i = ray_mod.RayBatch(origin=orig2.astype(jnp.float32),
                          dir=d2.astype(jnp.float32),
                          t_max=jnp.full(N, 3e38, jnp.float32))
mi = bench(lambda r: tr.trace(r, mode="rowdense"), rays_i)
print(f"incoherent rowdense:     {mi:.1f} Mrays/s", flush=True)
mis = bench(lambda r: tr.trace(r, mode="rowdense", sort=True), rays_i)
print(f"incoherent rowdense+sort:{mis:.1f} Mrays/s", flush=True)
