"""Trace-only cost of the interior geometry, before/after the big/small
triangle partition (round 4): camera rays + one incoherent bounce batch,
closest-hit and any-hit, one-hot and row-dense."""
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
from pbrs_tpu.accel import trace_pallas as tp
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene.pbrt import loader as pbrt_loader

size = (1024, 1024)
scene = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
cam = scene.camera
fresh = cam_mod.make_camera(size, 40.0)
scene = scene.replace(camera=fresh.replace(
    center=cam.center, orientation=cam.orientation,
    a=cam.a * (cam.width // 2) / (size[0] // 2),
    b=cam.b * (cam.height // 2) / (size[1] // 2), c=cam.c))

tracer = tp.PallasTracer(scene.geom)
print(f"flat bank rows: {tracer.counts}  bvhs: "
      f"{[(b.kind, b.t_count, b.n_chunks) for b in tracer.bvhs]}",
      flush=True)

sampler = smp.PCGSampler(0)
n = size[0] * size[1]
order = wavefront.morton_pixel_order(size[0], size[1])
pix = jnp.asarray(order)
rays = jax.jit(lambda: wavefront.camera_rays(
    scene, sampler, pix, jnp.zeros(n, jnp.int32), 2))()
jax.block_until_ready(rays)

# Incoherent batch: random origins in the room, random dirs.
rng = np.random.default_rng(0)
o = rng.uniform([-3, 0, -4], [3, 3, 4], (n, 3)).astype(np.float32)
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
import pbrs_tpu.geometry.ray as ray_mod
rays_inc = ray_mod.RayBatch(origin=jnp.asarray(o), dir=jnp.asarray(d),
                            t_max=jnp.full(n, 3e38, jnp.float32))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:30s} {ms:9.2f} ms   {n / ms / 1e3:8.2f} Mrays/s",
          flush=True)


for mode in (None, "rowdense"):
    mn = mode or "onehot"
    f_tr = jax.jit(lambda r, m=mode: tracer.trace(r, mode=m))
    f_oc = jax.jit(lambda r, m=mode: tracer.occluded(r, mode=m))
    t, idx = f_tr(rays)
    print(f"  {mn}: camera hit frac "
          f"{float(jnp.mean(jnp.isfinite(t))):.4f} "
          f"nan {int(jnp.sum(jnp.isnan(t)))}", flush=True)
    timeit(f"trace/{mn}/camera", f_tr, rays)
    timeit(f"trace/{mn}/incoherent", f_tr, rays_inc)
    timeit(f"anyhit/{mn}/camera", f_oc, rays)
    timeit(f"anyhit/{mn}/incoherent", f_oc, rays_inc)

# Full scene-aware trace fns (instanced groups included).
for mode in (None,):
    isect_fn, occl_fn = td.make_trace_fns(scene, trace_mode=mode)
    f = jax.jit(lambda r: isect_fn(r).t)
    timeit("isect_full/camera", f, rays)
    f2 = jax.jit(occl_fn)
    timeit("occl_full/camera", f2, rays)
