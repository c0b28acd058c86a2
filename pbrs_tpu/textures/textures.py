"""Device-resident texture table.

Textures are rows in a typed table (kind + params + a shared flat image
atlas); evaluation gathers per-hit and mask-selects over kinds — replacing
the reference's `Arc<dyn Texture>` virtual calls (reference texture/src/lib.rs).

Kinds:
  SOLID    color_a                                  [ref: texture/src/lib.rs:19-33]
  CHECKER  3D sine checker, odd/even colors         [ref: lib.rs:35-49]
  PERLIN   marble pattern over gradient noise       [ref: lib.rs:51-160]
  IMAGE    nearest-neighbor clamp sampling, atlas   [ref: lib.rs:162-223]
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core import vecmath as vm

SOLID = 0
CHECKER = 1
PERLIN = 2
IMAGE = 3

_PERLIN_N = 256


@struct.dataclass
class TextureTable:
    kind: jnp.ndarray  # [T] int32
    color_a: jnp.ndarray  # [T,3] solid color / checker even
    color_b: jnp.ndarray  # [T,3] checker odd
    freq: jnp.ndarray  # [T] perlin frequency
    img_offset: jnp.ndarray  # [T] int32 offset into atlas
    img_w: jnp.ndarray  # [T] int32
    img_h: jnp.ndarray  # [T] int32
    atlas: jnp.ndarray  # [P,3] flattened image pixels
    perlin_grad: jnp.ndarray  # [256,3]
    perlin_perm: jnp.ndarray  # [3,256] int32


def _perlin_tables(seed=12345):
    rng = np.random.default_rng(seed)
    # Uniform random unit vectors on the sphere.
    v = rng.normal(size=(_PERLIN_N, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    perms = np.stack([rng.permutation(_PERLIN_N) for _ in range(3)])
    return v.astype(np.float32), perms.astype(np.int32)


def _perlin_noise(table: TextureTable, p):
    """Gradient lattice noise. [ref: texture/src/lib.rs:98-139]"""
    pf = p
    i0 = jnp.floor(pf).astype(jnp.int32)
    frac = pf - jnp.floor(pf)
    sm = frac * frac * (3.0 - 2.0 * frac)  # smoothstep weights [N,3]
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    perm = table.perlin_perm
    grad = table.perlin_grad
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                ii = (i0[..., 0] + di) & 255
                jj = (i0[..., 1] + dj) & 255
                kk = (i0[..., 2] + dk) & 255
                idx = perm[0][ii] ^ perm[1][jj] ^ perm[2][kk]
                g = grad[idx]
                wv = jnp.stack(
                    [frac[..., 0] - di, frac[..., 1] - dj, frac[..., 2] - dk],
                    axis=-1,
                )
                dotp = vm.dot(g, wv)
                wu = sm[..., 0] * di + (1.0 - sm[..., 0]) * (1 - di)
                wj = sm[..., 1] * dj + (1.0 - sm[..., 1]) * (1 - dj)
                wk = sm[..., 2] * dk + (1.0 - sm[..., 2]) * (1 - dk)
                accum = accum + wu * wj * wk * dotp
    return accum


def _perlin_turbulence(table: TextureTable, p, octaves=7):
    """[ref: texture/src/lib.rs:141-149]"""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for i in range(octaves):
        accum = accum + 0.5**i * _perlin_noise(table, p * (2.0**i))
    return jnp.abs(accum)


def eval_texture(table: TextureTable, tex_id, uv, pos):
    """Evaluate textures for per-hit tex ids. tex_id [N], uv [N,2], pos [N,3].
    tex_id < 0 yields black (callers overlay solid colors themselves)."""
    tid = jnp.maximum(tex_id, 0)
    kind = table.kind[tid]
    ca = table.color_a[tid]
    cb = table.color_b[tid]

    out = ca  # SOLID

    # CHECKER: sines of 10x position. [ref: lib.rs:41-48]
    sines = (
        jnp.sin(10.0 * pos[..., 0])
        * jnp.sin(10.0 * pos[..., 1])
        * jnp.sin(10.0 * pos[..., 2])
    )
    checker = jnp.where((sines < 0.0)[..., None], cb, ca)
    out = jnp.where((kind == CHECKER)[..., None], checker, out)

    # PERLIN marble: sin(freq*z + 10*turbulence(p)) * .5 + .5.
    # [ref: lib.rs:151-160]. Noise lattice is scaled by freq inside noise()
    # in the reference; turbulence feeds unscaled p, noise applies freq.
    # Reference noise() multiplies by freq internally and turbulance scales
    # by 2^i; equivalent to evaluating noise at freq * 2^i * p.
    freq = table.freq[tid]
    turb = _perlin_turbulence_scaled(table, pos, freq)
    marble = jnp.sin(freq * pos[..., 2] + 10.0 * turb) * 0.5 + 0.5
    out = jnp.where((kind == PERLIN)[..., None], marble[..., None], out)

    # IMAGE: nearest with uv clamp. [ref: lib.rs:205-216]
    u = jnp.clip(uv[..., 0], 0.0, 1.0)
    v = jnp.clip(uv[..., 1], 0.0, 1.0)
    w = table.img_w[tid]
    h = table.img_h[tid]
    col = jnp.mod((u * w).astype(jnp.int32), jnp.maximum(w, 1))
    row = jnp.mod((v * h).astype(jnp.int32), jnp.maximum(h, 1))
    pix = table.atlas[table.img_offset[tid] + row * w + col]
    out = jnp.where((kind == IMAGE)[..., None], pix, out)
    return jnp.where((tex_id < 0)[..., None], 0.0, out)


def _perlin_turbulence_scaled(table: TextureTable, p, freq, octaves=7):
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for i in range(octaves):
        accum = accum + 0.5**i * _perlin_noise(
            table, p * (freq * 2.0**i)[..., None]
        )
    return jnp.abs(accum)


class TextureBuilder:
    """Host-side accumulator. `add_*` returns the texture id."""

    def __init__(self):
        self.rows = []  # (kind, color_a, color_b, freq, image|None)
        self.images = []

    def add_solid(self, color) -> int:
        self.rows.append((SOLID, np.asarray(color, np.float32), np.zeros(3), 1.0, None))
        return len(self.rows) - 1

    def add_checker(self, even, odd) -> int:
        self.rows.append(
            (CHECKER, np.asarray(even, np.float32), np.asarray(odd, np.float32), 1.0, None)
        )
        return len(self.rows) - 1

    def add_perlin(self, freq: float) -> int:
        self.rows.append((PERLIN, np.zeros(3), np.zeros(3), float(freq), None))
        return len(self.rows) - 1

    def add_image(self, pixels_hw3) -> int:
        img = np.asarray(pixels_hw3, np.float32)
        assert img.ndim == 3 and img.shape[2] == 3
        self.rows.append((IMAGE, np.zeros(3), np.zeros(3), 1.0, img))
        return len(self.rows) - 1

    def add_image_file(self, path: str) -> int:
        from PIL import Image as PILImage

        img = np.asarray(PILImage.open(path).convert("RGB"), np.float32) / 255.0
        return self.add_image(img)

    def build(self) -> TextureTable:
        rows = self.rows or [(SOLID, np.zeros(3), np.zeros(3), 1.0, None)]
        offsets, widths, heights = [], [], []
        atlas_parts = []
        cursor = 0
        for (_, _, _, _, img) in rows:
            if img is None:
                offsets.append(0)
                widths.append(0)
                heights.append(0)
            else:
                offsets.append(cursor)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                atlas_parts.append(img.reshape(-1, 3))
                cursor += img.shape[0] * img.shape[1]
        atlas = (
            np.concatenate(atlas_parts, axis=0)
            if atlas_parts
            else np.zeros((1, 3), np.float32)
        )
        grad, perm = _perlin_tables()
        return TextureTable(
            kind=jnp.asarray([r[0] for r in rows], jnp.int32),
            color_a=jnp.asarray(np.stack([r[1] for r in rows])),
            color_b=jnp.asarray(np.stack([r[2] for r in rows])),
            freq=jnp.asarray([r[3] for r in rows], jnp.float32),
            img_offset=jnp.asarray(offsets, jnp.int32),
            img_w=jnp.asarray(widths, jnp.int32),
            img_h=jnp.asarray(heights, jnp.int32),
            atlas=jnp.asarray(atlas),
            perlin_grad=jnp.asarray(grad),
            perlin_perm=jnp.asarray(perm),
        )
