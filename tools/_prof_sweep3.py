"""Post-chunkbox-phase1 sweep + interior phase profile (run after benchmarks)."""
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
sampler = smp.PCGSampler(0)
pix = jnp.arange(N, dtype=jnp.int32) % (800 * 600)
rays_c = wavefront.camera_rays(scene, sampler, pix, jnp.zeros(N, jnp.int32), 2)
key = jax.random.PRNGKey(1)
k1, k2 = jax.random.split(key)
lo = p0.min(0); hi = p0.max(0)
ctr = (lo + hi) / 2; ext = hi - lo
orig = jax.random.uniform(k1, (N, 3)) * ext * 2 + (ctr - ext)
d = jax.random.normal(k2, (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
rays_i = ray_mod.RayBatch(origin=orig.astype(jnp.float32),
                          dir=d.astype(jnp.float32),
                          t_max=jnp.full(N, 3e38, jnp.float32))

def bench(tracer, rays, reps=4):
    f = jax.jit(lambda r: tracer.trace(r))
    t, idx = f(rays); t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6

bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
best = None
for tsize in (64, 32, 16):
    try:
        tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2),
                              bl, bh, 0, treelet=tsize)
        mc = bench(tr, rays_c); mi = bench(tr, rays_i)
        print(f"v2 treelet={tsize}: t_count={tr.t_count} chunks={tr.n_chunks} "
              f"coherent {mc:.1f} incoherent {mi:.1f}", flush=True)
    except Exception as e:
        print(f"v2 treelet={tsize}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

# verify exactness vs numpy brute force on a small batch
tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh, 0)
sub = ray_mod.RayBatch(origin=rays_c.origin[:4096], dir=rays_c.dir[:4096],
                       t_max=rays_c.t_max[:4096])
t_tr, idx_tr = jax.jit(lambda r: tr.trace(r))(sub)
o = np.asarray(sub.origin); dd = np.asarray(sub.dir)
print("checking exactness on 4096 rays...", flush=True)
e1 = p1 - p0; e2 = p2 - p0
tb = np.full(4096, np.inf, np.float32)
for i in range(0, 4096, 512):
    ob = o[i:i+512, None]; db = dd[i:i+512, None]
    pv = np.cross(db, e2[None])
    det = (e1[None] * pv).sum(-1)
    inv = np.where(det == 0, 1.0, 1.0 / det)
    tv = ob - p0[None]
    u = (tv * pv).sum(-1) * inv
    qv = np.cross(tv, e1[None])
    v = (db * qv).sum(-1) * inv
    tt = (e2[None] * qv).sum(-1) * inv
    ok = (det != 0) & (u > 0) & (v > 0) & (u + v < 1) & (tt >= 1e-3)
    tt = np.where(ok, tt, np.inf)
    tb[i:i+512] = tt.min(1)
t_tr = np.asarray(t_tr)
mism = (~np.isclose(t_tr, tb, rtol=1e-5, atol=1e-6) & ~(np.isinf(t_tr) & np.isinf(tb))).sum()
print("t mismatches vs numpy:", int(mism), flush=True)

# interior phase profile
from pbrs_tpu.scene.pbrt import loader as pbrt_loader
from pbrs_tpu import profiling
interior = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
ph = profiling.profile_phases(interior, n_pixels=1 << 20, max_depth=5)
print("interior phases:", ph, flush=True)

# interior end-to-end: fused_wave vs general, 1M lanes, depth 5
from pbrs_tpu.accel import fused_wave as fw
from pbrs_tpu.accel import dispatch as td
n = 1 << 20
npix = interior.camera.width * interior.camera.height
pixi = jnp.arange(n, dtype=jnp.int32) % npix
print("wave eligible:", fw.scene_supports_wave(interior), flush=True)
integ = fw.FusedWaveIntegrator(interior)
f_wave = jax.jit(lambda s: integ.render_samples(
    sampler, pixi, s, max_depth=5, msaa=2, return_ray_count=True))
r, c = f_wave(0); r.block_until_ready()
t0 = time.time()
for s in range(1, 4):
    r, c = f_wave(s)
    tot = float(c)
r.block_until_ready()
dt = (time.time() - t0) / 3
print(f"interior fused_wave: {tot/dt/1e6:.2f} Mrays/s "
      f"({dt*1e3:.0f} ms/launch, checksum {float(jnp.sum(r)):.1f})",
      flush=True)

isect_fn, occl_fn = td.make_trace_fns(interior)
f_gen = jax.jit(lambda s: wavefront.render_samples(
    interior, sampler, pixi, s, max_depth=5, msaa=2,
    intersect_fn=isect_fn, occlude_fn=occl_fn, return_ray_count=True))
r, c = f_gen(0); r.block_until_ready()
t0 = time.time()
for s in range(1, 4):
    r, c = f_gen(s)
    tot = float(c)
r.block_until_ready()
dt = (time.time() - t0) / 3
print(f"interior general: {tot/dt/1e6:.2f} Mrays/s "
      f"({dt*1e3:.0f} ms/launch, checksum {float(jnp.sum(r)):.1f})",
      flush=True)
