"""Rowdense: visit counts + tile-order (morton pixel) probe."""
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
W, H = 800, 600
sampler = smp.PCGSampler(0)

def morton2(x, y):
    def part(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return part(x) | (part(y) << 1)

pix_scan = np.arange(N, dtype=np.int32) % (W * H)
xs = pix_scan % W; ys = pix_scan // W
order = np.argsort(morton2(xs.astype(np.int64), ys.astype(np.int64)),
                   kind="stable")
pix_mort = pix_scan[order]

bl, bh = bvh_mod.triangle_bboxes(p0, p1, p2)
tr = tl.TreeletTracer(tl.KIND_TRI, tl._tri_fields(p0, p1, p2), bl, bh, 0)

def rays_for(pix):
    return wavefront.camera_rays(scene, sampler, jnp.asarray(pix),
                                 jnp.zeros(N, jnp.int32), 2)

def bench(fn, rays, reps=4):
    f = jax.jit(fn)
    t, idx = f(rays); t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, idx = f(rays)
    t.block_until_ready()
    return N / ((time.time() - t0) / reps) / 1e6

rays_s = rays_for(pix_scan)
rays_m = rays_for(pix_mort)

# visit counts via debug wrapper
from pbrs_tpu.accel.treelet import _trace_blocks_rowdense, N_FIELDS
def rounds(rays):
    comps, n = tr._components(rays)
    t, _ = _trace_blocks_rowdense(
        tr.boxes, tr.table_flat, tuple(comps), kind=tr.kind,
        t_pad=tr.t_pad, t_count=tr.t_count, nf=N_FIELDS[tr.kind],
        treelet=tr.treelet, rays=tr.rays, subrows=tr.subrows,
        debug_rounds=True)
    r = np.asarray(t)[:, 0] / 100.0
    return r.mean(), r.max()

m_s = bench(lambda r: tr.trace(r, mode='rowdense'), rays_s)
m_m = bench(lambda r: tr.trace(r, mode='rowdense'), rays_m)
m_o = bench(lambda r: tr.trace(r), rays_m)
print(f"scanline rowdense {m_s:.1f}  morton rowdense {m_m:.1f}  "
      f"morton onehot {m_o:.1f} Mrays/s", flush=True)
print("visits/row scanline: mean %.1f max %.0f" % rounds(rays_s), flush=True)
print("visits/row morton:   mean %.1f max %.0f" % rounds(rays_m), flush=True)
