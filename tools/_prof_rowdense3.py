"""Rowdense v2 (chunk-gated init): morton probe, prints incrementally."""
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
W, H = 800, 600
sampler = smp.PCGSampler(0)
order = wavefront.morton_pixel_order(W, H)
pix_mort = np.concatenate([order, order[:N - W * H]])
bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh, 0)
rays_m = wavefront.camera_rays(scene, sampler, jnp.asarray(pix_mort),
                               jnp.zeros(N, jnp.int32), 2)

def bench(fn, rays, reps=4):
    f = jax.jit(fn)
    t0 = time.time()
    t, idx = f(rays); t.block_until_ready()
    print(f"  (compile+1run {time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6

m = bench(lambda r: tr.trace(r, mode='rowdense'), rays_m)
print(f"morton rowdense v2: {m:.1f} Mrays/s", flush=True)
ma = bench(lambda r: tr.trace(r, mode='rowdense', any_hit=True), rays_m)
print(f"morton rowdense anyhit: {ma:.1f} Mrays/s", flush=True)
