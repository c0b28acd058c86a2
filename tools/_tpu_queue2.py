"""Interior scene phase profile + trace-mode A/B on TPU (run after queue1).

Uses Morton lane order throughout (the render paths now do the same).
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

from pbrs_tpu.accel import dispatch as trace_dispatch
from pbrs_tpu.accel import fused_wave as fw
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene.pbrt import loader as pbrt_loader

scene = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
W, H = scene.camera.width, scene.camera.height
print(f"interior {W}x{H}, supports_wave={fw.scene_supports_wave(scene)}",
      flush=True)

n = 1 << 20
sampler = smp.PCGSampler(0)
order = wavefront.morton_pixel_order(W, H)
reps = max(1, -(-n // order.shape[0]))
pix = jnp.asarray(np.tile(order, reps)[:n])
sid = jnp.zeros(n, jnp.int32)


def timeit(name, fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  ({name} compile {time.time()-t0:.1f}s)", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(ts))
    print(f"{name:28s} {ms:9.2f} ms   {n/ms/1e3:8.2f} Mrays/s", flush=True)
    return ms


for mode in (None, "rowdense"):
    tag = mode or "onehot"
    isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene, None,
                                                      trace_mode=mode)
    raygen = jax.jit(lambda p, s: wavefront.camera_rays(scene, sampler, p,
                                                        s, 1))
    rays = raygen(pix, sid)
    jax.block_until_ready(rays)
    timeit(f"trace[{tag}]", jax.jit(lambda r: isect_fn(r)), rays)
    timeit(f"occlude[{tag}]", jax.jit(lambda r: occl_fn(r)), rays)

# full wave bounce A/B at depth 4 (the benchmark shape, fewer bounces)
for mode in (None, "rowdense"):
    tag = mode or "onehot"
    integ = fw.FusedWaveIntegrator(scene, trace_mode=mode)
    f = jax.jit(lambda p, s: jnp.sum(integ.render_samples(
        sampler, p, s, max_depth=4, msaa=1)))
    timeit(f"wave depth4[{tag}]", f, pix, sid)

# compacted + sorted variant (rowdense)
integ = fw.FusedWaveIntegrator(scene, trace_mode="rowdense")
isect_fn, _ = trace_dispatch.make_trace_fns(scene, None,
                                            trace_mode="rowdense")
counts = np.asarray(jax.jit(lambda: wavefront.measure_alive(
    scene, sampler, pix, sid, max_depth=4, msaa=1,
    intersect_fn=isect_fn))())
sched = wavefront.auto_schedule(counts, n)
print("covered:", [int(c) for c in counts], "schedule:", sched, flush=True)
fc = jax.jit(lambda p, s: jnp.sum(integ.render_samples_compacted(
    sampler, p, s, sched, max_depth=4, msaa=1)))
timeit("wave depth4[rd+compact]", fc, pix, sid)

# radiance agreement check masked vs compacted
a = jax.jit(lambda p, s: integ.render_samples(
    sampler, p, s, max_depth=4, msaa=1))(pix[:65536], sid[:65536])
b = jax.jit(lambda p, s: integ.render_samples_compacted(
    sampler, p, s, wavefront.auto_schedule(counts, 65536), max_depth=4,
    msaa=1))(pix[:65536], sid[:65536])
d = float(jnp.max(jnp.abs(a - b)))
print(f"masked vs compacted maxdiff: {d:.3e}", flush=True)
