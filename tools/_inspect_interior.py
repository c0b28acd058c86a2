import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import _chip_health  # noqa: F401  (aborts if the shared chip is sick)
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pbrs_tpu.scene.pbrt import loader as pbrt_loader
from pbrs_tpu.shapes import intersect as isect_mod
from pbrs_tpu.accel import instanced as inst_mod

scene = pbrt_loader.build_scene("scenes/interior/interior.pbrt")
g = scene.geom
print("base geom counts (sph,quad,tri,disk):", isect_mod.geom_counts(g))
for i, grp in enumerate(getattr(scene, "instanced", ())):
    c = isect_mod.geom_counts(grp.geom)
    print(f"group {i}: inst={grp.fwd.shape[0]} counts={c} flattenable={inst_mod.flattenable(grp)}")
mt = scene.materials
print("n_mats:", np.asarray(mt.kind).shape, "textured_slots:", mt.textured_slots)
print("env kind:", scene.env.kind, "has dist:", getattr(scene.env, "dist", None) is not None)
tx = scene.textures
import jax.numpy as jnp
for f in ("atlas",):
    a = getattr(tx, f, None)
    if a is not None: print("texture atlas:", a.shape)
print("area lights:", scene.area_lights.count, "delta:", scene.delta_lights.count)
from pbrs_tpu.accel import fused_wave as fw
print("supports_wave:", fw.scene_supports_wave(scene))
