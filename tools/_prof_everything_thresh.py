"""TREELET_THRESHOLD study on the 'everything' preset: its 1000-sphere
family sits just under the 1024 flat-sweep/treelet crossover while the
2400-quad family is already treelet-traced. Measures closest/any-hit at
both thresholds on camera + incoherent batches."""
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

from pbrs_tpu.accel import trace_pallas as tp
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets
import pbrs_tpu.geometry.ray as ray_mod

scene = presets.everything()
sampler = smp.PCGSampler(0)
w = h = 800
n = w * h
order = wavefront.morton_pixel_order(w, h)
pix = jnp.asarray(order)
rays = jax.jit(lambda: wavefront.camera_rays(
    scene, sampler, pix, jnp.zeros(n, jnp.int32), 2))()
jax.block_until_ready(rays)

rng = np.random.default_rng(0)
o = rng.uniform([-15, 0, -15], [15, 10, 15], (n, 3)).astype(np.float32)
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
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
    print(f"{name:34s} {ms:9.2f} ms   {n / ms / 1e3:8.2f} Mrays/s",
          flush=True)


for thresh in (1024, 512):
    tr = tp.PallasTracer(scene.geom, bvh_threshold=thresh)
    print(f"threshold {thresh}: flat rows {tr.counts} "
          f"bvhs {[(b.kind, b.t_count, b.n_chunks) for b in tr.bvhs]}",
          flush=True)
    for mode in (None, "rowdense"):
        mn = mode or "onehot"
        f = jax.jit(lambda r, m=mode, t=tr: t.trace(r, mode=m))
        t, i = f(rays)
        print(f"  hit frac {float(jnp.mean(jnp.isfinite(t))):.4f}",
              flush=True)
        timeit(f"T{thresh}/{mn}/camera", f, rays)
        timeit(f"T{thresh}/{mn}/incoherent", f, rays_inc)
