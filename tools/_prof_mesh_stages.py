"""Trace-vs-shade split for the mesh_ball and everything bench configs.

mesh_ball sits at 8.4 Mrays e2e while the one-hot/row-dense tracers
measure 24-44 Mrays raw (ARCHITECTURE §10-11) — so either bounce batches
are far slower than the coherent numbers, or the shade side dominates.
This times, at the bench's exact launch shapes: (a) one full launch of
each tuner candidate, (b) closest-hit and any-hit trace on the real
bounce-0 / bounce-1 / bounce-2 batches, in both trace modes.
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
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.scene import presets

WHICH = _sys.argv[1] if len(_sys.argv) > 1 else "mesh"

if WHICH == "mesh":
    scene = presets.mesh_ball()
    size, spl, depth = (800, 608), 2, 6
else:
    scene = presets.everything()
    size, spl, depth = (800, 800), 1, 5

cam = scene.camera
fresh = cam_mod.make_camera(size, 40.0)
scene = scene.replace(camera=fresh.replace(
    center=cam.center, orientation=cam.orientation,
    a=cam.a * (cam.width // 2) / (size[0] // 2),
    b=cam.b * (cam.height // 2) / (size[1] // 2), c=cam.c))

sampler = smp.PCGSampler(0)
n = size[0] * size[1]
order = wavefront.morton_pixel_order(size[0], size[1])
pix = jnp.asarray(np.tile(order, spl))
sid = jnp.repeat(jnp.arange(spl), n).astype(jnp.int32)
print(f"scene={WHICH} lanes={pix.shape[0]} depth={depth}", flush=True)


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:34s} {ms:9.2f} ms", flush=True)
    return ms


# ---- full launches of the leading candidates ----
from pbrs_tpu import tuner

for label, tm, comp in [("general-folded/onehot", "onehot", False),
                        ("general-folded/onehot/compact", "onehot", True),
                        ("general-folded/rowdense", "rowdense", False),
                        ("general-folded/rowdense/compact", "rowdense", True),
                        ("general-folded/rowdyn", "rowdyn", False),
                        ("general-folded/rowdyn/compact", "rowdyn", True)]:
    try:
        t = tuner.tune(scene, sampler, pix, sid, depth=depth, msaa=2,
                       trace_mode=tm, compact=comp, verbose=True)
        fn = jax.jit(lambda l, s, t=t: t(l, s))
        ms = timeit(f"launch {t.label}", fn, pix, sid)
        cnt = float(fn(pix, sid)[1])
        print(f"   segments/launch {cnt/1e6:.2f} M -> "
              f"{cnt/ms/1e3:.1f} Mrays/s", flush=True)
    except Exception as e:
        print(f"launch {label}: FAILED {type(e).__name__}: {e}", flush=True)

# ---- marginal bounce cost: launch wall at depth 1..depth ----
t1 = tuner.tune(scene, sampler, pix, sid, depth=depth, msaa=2,
                trace_mode="onehot", compact=False)
prev = 0.0
for d in range(1, depth + 1):
    td_ = tuner.tune(scene, sampler, pix, sid, depth=d, msaa=2,
                     trace_mode="onehot", compact=False)
    fn = jax.jit(lambda l, s, t=td_: t(l, s))
    ms = timeit(f"depth={d} launch", fn, pix, sid)
    cnt = float(fn(pix, sid)[1])
    print(f"   segs {cnt/1e6:.2f}M  marginal {ms-prev:.1f} ms", flush=True)
    prev = ms

# ---- raw trace: coherent (morton) vs scrambled camera rays ----
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(int(pix.shape[0])))
for tm in ("onehot", "rowdense", "rowdyn"):
    isect, occl = td.make_trace_fns(scene, trace_mode=tm)
    isect_j = jax.jit(isect)
    occl_rate = None
    rays0 = jax.jit(lambda: wavefront.camera_rays(
        scene, sampler, pix, sid, 2))()
    ms = timeit(f"[{tm}] closest coherent", isect_j, rays0)
    print(f"   -> {pix.shape[0]/ms/1e3:.1f} Mrays/s", flush=True)
    rays_s = jax.tree.map(lambda a: a[perm] if a.shape[:1] == pix.shape
                          else a, rays0)
    ms = timeit(f"[{tm}] closest scrambled", isect_j, rays_s)
    print(f"   -> {pix.shape[0]/ms/1e3:.1f} Mrays/s", flush=True)
