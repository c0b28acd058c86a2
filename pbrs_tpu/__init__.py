"""pbrs_tpu — a TPU-native wavefront path tracer.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
``pbrs`` CPU path tracer (reference: /root/reference). The recursive CPU
megakernel becomes a breadth-first wavefront loop over SoA ray batches;
BVH traversal is a flattened-array while-loop kernel; BSDF evaluation and
sampling are branchless vectorized dispatch over lobe tables; samplers are
counter-based and stateless so every pixel-sample is independently jittable.

Layering (mirrors reference crate DAG, reference Cargo.toml:44-53):
  core        — math substrate (vecmath, rng, spline, filters)   [ref: math/]
  radiometry  — color & spectra                                  [ref: radiometry/]
  geometry    — rays, cameras, transforms, interactions          [ref: geometry/]
  shapes      — typed primitive SoA tables + intersection        [ref: shape/]
  bxdf        — BSDF lobe models, fresnel, microfacet            [ref: geometry/src/bxdf.rs]
  materials   — material → lobe-table compiler                   [ref: material/]
  textures    — solid/checker/perlin/image texture tables        [ref: texture/]
  lights      — delta/area/env lights + shape sampling           [ref: light/]
  accel       — host BVH builders + device traversal             [ref: tlas/, shape/src/blas.rs]
  scene       — PBRT parser, PLY loader, presets, scene compiler [ref: scene_parser/, scene/]
  integrators — wavefront path / direct-lighting integrators     [ref: src/]
  io          — EXR/PNG output
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry flows through matmuls (camera basis, one-hot table lookups,
# transform einsums). TPU matmuls default to bf16 inputs — an 8-bit
# mantissa turns a wall at x=554 into x=552. Force true-f32 MXU passes;
# these matmuls are a negligible fraction of the frame.
_jax.config.update("jax_default_matmul_precision", "highest")
