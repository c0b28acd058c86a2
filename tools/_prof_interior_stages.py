"""Per-stage cost of one interior bounce at 1M lanes: where do the
~2.3 s/launch (depth 5) actually go? Trace was measured at ~0.75 s total
(_prof_trace_partition), so ~1.5 s is shading-side — this isolates
material fetch, frame, NEE (env CDF + area + MIS), BSDF sampling, env
radiance eval, and texture eval."""
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
from pbrs_tpu.bxdf import bsdf as bsdf_mod
from pbrs_tpu.core import sampler as smp
from pbrs_tpu.core import vecmath as vm
from pbrs_tpu.geometry import camera as cam_mod
from pbrs_tpu.integrators import nee
from pbrs_tpu.integrators import wavefront
from pbrs_tpu.lights import lights as lt
from pbrs_tpu.materials import table as mat_mod
from pbrs_tpu.scene.pbrt import loader as pbrt_loader

size = (1024, 1024)
scene = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
cam = scene.camera
fresh = cam_mod.make_camera(size, 40.0)
scene = scene.replace(camera=fresh.replace(
    center=cam.center, orientation=cam.orientation,
    a=cam.a * (cam.width // 2) / (size[0] // 2),
    b=cam.b * (cam.height // 2) / (size[1] // 2), c=cam.c))

sampler = smp.PCGSampler(0)
n = size[0] * size[1]
order = wavefront.morton_pixel_order(size[0], size[1])
pix = jnp.asarray(order)
sid = jnp.zeros(n, jnp.int32)
isect_fn, occl_fn = td.make_trace_fns(scene)

rays = jax.jit(lambda: wavefront.camera_rays(scene, sampler, pix, sid, 2))()
hit = jax.jit(isect_fn)(rays)
jax.block_until_ready(hit)


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:26s} {ms:9.2f} ms", flush=True)
    return ms


timeit("camera_rays", jax.jit(
    lambda: wavefront.camera_rays(scene, sampler, pix, sid, 2)))
timeit("trace(closest)", jax.jit(isect_fn), rays)

f_shade = jax.jit(lambda h: mat_mod.shading_at(
    scene.materials, scene.textures, h.mat_id, h.uv, h.pos))
lobes, emit = f_shade(hit)
timeit("shading_at(mat+tex)", f_shade, hit)

f_env = jax.jit(lambda r: lt.eval_env(scene.env, r.dir))
timeit("eval_env(image)", f_env, rays)

f_frame = jax.jit(lambda h: bsdf_mod.make_frame(h.normal, h.dpdu))
frame = f_frame(hit)
timeit("make_frame", f_frame, hit)

u_sel = sampler.u1(pix, sid, 0, smp.DIM_LIGHT_SELECT)
u_light = sampler.u2(pix, sid, 0, smp.DIM_LIGHT_UV)
u_scatter = sampler.u2(pix, sid, 0, smp.DIM_SCATTER_UV)
alive = jnp.ones(n, bool)


def f_nee(lobes, frame, h):
    return nee.uniform_sample_one_light(
        scene, lobes, frame, h.pos, h.normal, h.wo,
        u_sel, u_light, u_scatter, occlude_fn=occl_fn, alive=alive)


t_nee = timeit("nee(full, 2 occl)", jax.jit(f_nee), lobes, frame, hit)


def f_nee_noocc(lobes, frame, h):
    return nee.uniform_sample_one_light(
        scene, lobes, frame, h.pos, h.normal, h.wo,
        u_sel, u_light, u_scatter,
        occlude_fn=lambda r: jnp.zeros(r.origin.shape[0], bool),
        alive=alive)


timeit("nee(no occl)", jax.jit(f_nee_noocc), lobes, frame, hit)

u_bsdf = sampler.u2(pix, sid, 0, smp.DIM_BSDF_UV)
f_samp = jax.jit(
    lambda lobes, frame, h: bsdf_mod.sample_bsdf(lobes, frame, h.wo, u_bsdf))
timeit("sample_bsdf", f_samp, lobes, frame, hit)

# Env-IS pieces, if the scene env has a sampling table.
try:
    from pbrs_tpu.lights import env_sampling as es

    f_es = jax.jit(lambda u: es.sample_env(scene.env.dist, u))
    timeit("env_is.sample", f_es, u_light)
    f_ep = jax.jit(lambda r: es.pdf_env(scene.env.dist, r.dir))
    timeit("env_is.pdf", f_ep, rays)
except Exception as e:
    print(f"env sample skipped: {e}", flush=True)

f_full = jax.jit(lambda p, s: wavefront.render_samples(
    scene, sampler, p, s, max_depth=5, msaa=2,
    intersect_fn=isect_fn, occlude_fn=occl_fn))
timeit("e2e general depth5", f_full, pix, sid)
