"""Small end-to-end TPU drive: compacted vs masked loop on mesh_ball(l2)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from pbrs_tpu.scene import presets
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.accel import dispatch as trace_dispatch
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.integrators import wavefront

scene = presets.mesh_ball(levels=3)
cam = scene.camera
fresh = cam_mod.make_camera((160, 120), 35.0)
scene = scene.replace(camera=fresh.replace(
    center=cam.center, orientation=cam.orientation, c=cam.c,
    a=cam.a * (cam.width // 2) / 80, b=cam.b * (cam.height // 2) / 60))
sampler = smp.PCGSampler(0)
n = 160 * 120
pix = jnp.arange(n, dtype=jnp.int32)
sid = jnp.zeros(n, jnp.int32)
isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene)

counts = np.asarray(jax.jit(lambda: wavefront.measure_alive(
    scene, sampler, pix, sid, max_depth=6, msaa=2,
    intersect_fn=isect_fn))())
print("covered:", [int(c) for c in counts], flush=True)
sched = wavefront.auto_schedule(counts, n, min_cap=512)
print("schedule:", sched, flush=True)

def run(shrink):
    f = jax.jit(lambda s: wavefront.render_samples(
        scene, sampler, pix, s, max_depth=6, msaa=2,
        intersect_fn=isect_fn, occlude_fn=occl_fn, shrink_schedule=shrink))
    out = f(sid); out.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = f(sid)
    out.block_until_ready()
    return np.asarray(out), (time.time() - t0) / 5

img_m, t_m = run(None)
img_c, t_c = run(sched)
d = np.abs(img_m - img_c)
rel = d.max() / max(img_m.max(), 1e-6)
print(f"masked {t_m*1e3:.1f} ms, compacted {t_c*1e3:.1f} ms, "
      f"speedup {t_m/t_c:.2f}x, maxdiff {d.max():.2e} rel {rel:.2e}",
      flush=True)
assert rel < 1e-4, rel
print("OK", flush=True)
