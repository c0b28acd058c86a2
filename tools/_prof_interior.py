"""Per-phase profile of the interior scene's actual fused_wave bounce on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from pbrs_tpu.scene.pbrt import loader as pbrt_loader
from pbrs_tpu.accel import dispatch as trace_dispatch
from pbrs_tpu.accel import fused_wave as fw
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront

scene = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
print("supports_wave:", fw.scene_supports_wave(scene), flush=True)

n = 1024 * 1024
sampler = smp.PCGSampler(0)
pix = jnp.arange(n, dtype=jnp.int32) % (scene.camera.width * scene.camera.height)
sid = jnp.zeros((), jnp.int32)

isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene, None)
raygen = jax.jit(lambda p, s: wavefront.camera_rays(scene, sampler, p, s, 1))
rays = raygen(pix, sid); jax.block_until_ready(rays)

def timeit(name, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(ts))
    print(f"{name:24s} {ms:9.2f} ms   {n/ms/1e3:8.2f} Mrays/s", flush=True)
    return ms

t_trace = timeit("trace", jax.jit(lambda r: isect_fn(r)), rays)
t_occl = timeit("occlude", jax.jit(lambda r: occl_fn(r)), rays)

integ = fw.FusedWaveIntegrator(scene)
f1 = jax.jit(lambda p, s: integ.render_samples(sampler, p, s, max_depth=1))
timeit("wave depth1", f1, pix, jnp.zeros(n, jnp.int32))
f5 = jax.jit(lambda p, s: integ.render_samples(sampler, p, s, max_depth=5))
t5 = timeit("wave depth5", f5, pix, jnp.zeros(n, jnp.int32))
# segments traced per depth-5 launch: ~n * sum(alive_i) + shadow rays; report raw
