"""Row-dense treelet tracer: exactness vs one-hot kernel + raw throughput."""
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
print(f"tris={p0.shape[0]}", flush=True)
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

bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh, 0)
print(f"t_count={tr.t_count} t_pad={tr.t_pad} rowdense_ok={tr.rowdense_ok}",
      flush=True)

def bench(fn, rays, reps=4):
    f = jax.jit(fn)
    t, idx = f(rays); t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6, t, idx

# exactness: rowdense vs onehot on a coherent + incoherent slice
for name, rr in (("coh", rays_c), ("inc", rays_i)):
    sub = ray_mod.RayBatch(origin=rr.origin[:8192], dir=rr.dir[:8192],
                           t_max=rr.t_max[:8192])
    t1, i1 = jax.jit(lambda r: tr.trace(r))(sub)
    t2, i2 = jax.jit(lambda r: tr.trace(r, mode="rowdense"))(sub)
    t1, i1, t2, i2 = map(np.asarray, (t1, i1, t2, i2))
    bad_t = np.sum(~np.isclose(np.where(np.isfinite(t1), t1, -1),
                               np.where(np.isfinite(t2), t2, -1),
                               rtol=1e-6, atol=1e-6))
    bad_i = np.sum(i1 != i2)
    print(f"{name}: t mismatches={bad_t} idx mismatches={bad_i}", flush=True)
    # any-hit agreement
    t1a, _ = jax.jit(lambda r: tr.trace(r, any_hit=True))(sub)
    t2a, _ = jax.jit(lambda r: tr.trace(r, any_hit=True, mode="rowdense"))(sub)
    b1, b2 = np.isfinite(np.asarray(t1a)), np.isfinite(np.asarray(t2a))
    print(f"{name} any_hit: blocked agree={np.sum(b1==b2)}/{b1.size}",
          flush=True)

for name, rr in (("coherent", rays_c), ("incoherent", rays_i)):
    m_old, _, _ = bench(lambda r: tr.trace(r), rr)
    m_new, _, _ = bench(lambda r: tr.trace(r, mode="rowdense"), rr)
    m_srt, _, _ = bench(lambda r: tr.trace(r, mode="rowdense", sort=True), rr)
    print(f"{name}: onehot {m_old:.1f}  rowdense {m_new:.1f}  "
          f"rowdense+sort {m_srt:.1f} Mrays/s", flush=True)
