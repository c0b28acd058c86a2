"""Measure the interior config under every integrator/trace/compact combo.

Round-4 question (VERDICT #3/#4): is fused_wave actually faster than the
general wavefront on the interior, and do rowdense/compaction win? One
timed launch per variant at the benchmark's own shapes feeds the tuner's
default selection.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _chip_health  # noqa: F401
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from pbrs_tpu.accel import dispatch as td
from pbrs_tpu.accel import fused_wave as fw
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene.pbrt import loader as pbrt_loader

size = (1024, 1024)
depth = 5
scene = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
cam = scene.camera
scale_w = (cam.width // 2) / (size[0] // 2)
scale_h = (cam.height // 2) / (size[1] // 2)
fresh = cam_mod.make_camera(size, 40.0)
scene = scene.replace(camera=fresh.replace(
    center=cam.center, orientation=cam.orientation,
    a=cam.a * scale_w, b=cam.b * scale_h, c=cam.c))

sampler = smp.PCGSampler(0)
n = size[0] * size[1]
order = wavefront.morton_pixel_order(size[0], size[1])
pix = jnp.asarray(order)
sid0 = jnp.zeros(n, jnp.int32)


def timeit(name, fn, iters=3):
    out = fn(1)
    jax.block_until_ready(out)
    ts = []
    for k in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(2 + k))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rad, cnt = out
    mrays = float(cnt) / dt / 1e6
    print(f"{name:34s} {dt*1e3:9.1f} ms  {mrays:8.2f} Mrays/s  "
          f"checksum {float(jnp.sum(rad)):.1f}", flush=True)


for mode in (None, "rowdense"):
    mname = mode or "onehot"
    isect_fn, occl_fn = td.make_trace_fns(scene, trace_mode=mode)

    # general wavefront, masked
    fn = jax.jit(lambda s, _i=isect_fn, _o=occl_fn: wavefront.render_samples(
        scene, sampler, pix, jnp.full(n, s, jnp.int32), max_depth=depth,
        msaa=2, intersect_fn=_i, occlude_fn=_o, return_ray_count=True))
    timeit(f"general/{mname}", fn)

    # general wavefront, compacted
    counts = np.asarray(jax.jit(
        lambda _i=isect_fn: wavefront.measure_alive(
            scene, sampler, pix, sid0, max_depth=depth, msaa=2,
            intersect_fn=_i))())
    sched = wavefront.auto_schedule(counts, n)
    print(f"  alive: {[int(c) for c in counts]} sched: {sched}", flush=True)
    fnc = jax.jit(lambda s, _i=isect_fn, _o=occl_fn: wavefront.render_samples(
        scene, sampler, pix, jnp.full(n, s, jnp.int32), max_depth=depth,
        msaa=2, intersect_fn=_i, occlude_fn=_o, return_ray_count=True,
        shrink_schedule=sched))
    timeit(f"general/{mname}/compact", fnc)

    # fused_wave
    integ = fw.FusedWaveIntegrator(scene, trace_mode=mode)
    fnw = jax.jit(lambda s, _g=integ: _g.render_samples(
        sampler, pix, jnp.full(n, s, jnp.int32), max_depth=depth, msaa=2,
        return_ray_count=True))
    timeit(f"wave/{mname}", fnw)
