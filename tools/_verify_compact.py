import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from pbrs_tpu.scene import presets
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.accel import dispatch as td

scene = presets.mesh_ball(levels=5)
isect, occl = td.make_trace_fns(scene)
sampler = smp.PCGSampler(0)
npix = scene.camera.width * scene.camera.height
n = 1 << 19
pix = jnp.arange(n, dtype=jnp.int32) % npix
sid0 = jnp.zeros(n, jnp.int32)

counts = np.asarray(jax.jit(lambda: wavefront.measure_alive(
    scene, sampler, pix, sid0, max_depth=6, msaa=2, intersect_fn=isect))())
sched = wavefront.auto_schedule(counts, n)
print("covered counts:", counts, "schedule:", sched, flush=True)

def bench(schedule):
    f = jax.jit(lambda s: wavefront.render_samples(
        scene, sampler, pix, jnp.full(n, s, jnp.int32), max_depth=6, msaa=2,
        intersect_fn=isect, occlude_fn=occl, return_ray_count=True,
        shrink_schedule=schedule))
    r, c = f(0); r.block_until_ready()
    t0 = time.time(); tot = 0.0
    for s in range(1, 4):
        r, c = f(s); tot = float(c)
    r.block_until_ready()
    dt = (time.time() - t0) / 3
    return tot / dt / 1e6, float(jnp.sum(r))

m0, c0 = bench(None)
m1, c1 = bench(sched)
print(f"masked: {m0:.2f} Mrays/s sum {c0:.1f}")
print(f"compacted: {m1:.2f} Mrays/s sum {c1:.1f}")
