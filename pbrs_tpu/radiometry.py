"""Radiometry: RGB radiance arithmetic and spectral utilities.

Colors are plain ``[..., 3]`` float32 arrays (linear sRGB primaries). This
replaces the reference Color/XYZ structs (reference radiometry/src/color.rs)
with array lanes, and the CIE-table spectral machinery
(reference radiometry/src/spectrum.rs:3-75) with Planck's law plus the
Wyman-Sloan-Shirley analytic fit of the CIE 1931 observer — host-side only,
run once at scene-load time.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# sRGB (D65) <-> CIE XYZ. [ref: radiometry/src/color.rs:196-238]
RGB_TO_XYZ = np.array(
    [
        [0.41245330, 0.35757984, 0.18042262],
        [0.21267127, 0.71515972, 0.07216883],
        [0.01933384, 0.11919363, 0.95022693],
    ],
    dtype=np.float32,
)
XYZ_TO_RGB = np.linalg.inv(RGB_TO_XYZ.astype(np.float64)).astype(np.float32)


def luminance(c):
    """CIE Y of a linear-RGB color. [ref: radiometry/src/color.rs:116-118]"""
    w = jnp.asarray(RGB_TO_XYZ[1], dtype=c.dtype)
    return jnp.sum(c * w, axis=-1)


def xyz_to_rgb(xyz):
    return xyz @ jnp.asarray(XYZ_TO_RGB).T


def rgb_to_xyz(rgb):
    return rgb @ jnp.asarray(RGB_TO_XYZ).T


def gamma_encode(c):
    """sqrt gamma, as in the reference PNG path. [ref: radiometry/src/color.rs:54-56]"""
    return jnp.sqrt(jnp.maximum(c, 0.0))


def to_u8(c):
    """Saturating [0,1] -> u8. [ref: radiometry/src/color.rs:60-66]"""
    return np.clip(np.asarray(c) * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


def from_u8(r: int, g: int, b: int):
    return np.array([r, g, b], dtype=np.float32) / 255.0


# ---------------------------------------------------------------------------
# Spectral -> RGB (host-side, NumPy). [ref: radiometry/src/spectrum.rs]
# ---------------------------------------------------------------------------

# Wyman, Sloan, Shirley, "Simple Analytic Approximations to the CIE XYZ
# Color Matching Functions", JCGT 2013 — multi-lobe Gaussian fit, replacing
# the reference's 471-entry sampled CIE tables (spectrum.rs:72-75).
def _gauss(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    t = (x - mu) / s
    return alpha * np.exp(-0.5 * t * t)


def cie_x(wavelength_nm):
    w = np.asarray(wavelength_nm, dtype=np.float64)
    return (
        _gauss(w, 0.362, 442.0, 16.0, 26.7)
        + _gauss(w, 1.056, 599.8, 37.9, 31.0)
        + _gauss(w, -0.065, 501.1, 20.4, 26.2)
    )


def cie_y(wavelength_nm):
    w = np.asarray(wavelength_nm, dtype=np.float64)
    return _gauss(w, 0.821, 568.8, 46.9, 40.5) + _gauss(w, 0.286, 530.9, 16.3, 31.1)


def cie_z(wavelength_nm):
    w = np.asarray(wavelength_nm, dtype=np.float64)
    return _gauss(w, 1.217, 437.0, 11.8, 36.0) + _gauss(w, 0.681, 459.0, 26.0, 13.8)


# Integral of cie_y over the visible range (normalization constant).
_CIE_LAMBDA = np.arange(360.0, 831.0, 1.0)
CIE_Y_INTEGRAL = float(np.trapezoid(cie_y(_CIE_LAMBDA), _CIE_LAMBDA))


def blackbody(wavelength_nm, temperature_k):
    """Planck spectral radiance (W·sr⁻¹·m⁻³). [ref: radiometry/src/spectrum.rs:3-25]"""
    lam = np.asarray(wavelength_nm, dtype=np.float64) * 1e-9
    h = 6.62606957e-34
    c = 299792458.0
    kb = 1.3806488e-23
    return (2.0 * h * c * c) / (
        lam**5 * (np.expm1(h * c / (lam * kb * float(temperature_k))))
    )


def blackbody_normalized(wavelength_nm, temperature_k):
    """Planck's law scaled so the Wien-peak wavelength has value 1.
    [ref: radiometry/src/spectrum.rs:27-36]"""
    lambda_max_nm = 2.8977721e-3 / float(temperature_k) * 1e9
    peak = blackbody(lambda_max_nm, temperature_k)
    return blackbody(wavelength_nm, temperature_k) / peak


def sampled_spectrum_to_rgb(wavelengths_nm, values):
    """Integrate an SPD against the CIE observer and convert to linear RGB.
    [ref: radiometry/src/spectrum.rs:57-70]"""
    lam = np.asarray(wavelengths_nm, dtype=np.float64)
    val = np.asarray(values, dtype=np.float64)
    order = np.argsort(lam)
    lam, val = lam[order], val[order]
    # Resample onto a dense 1nm grid covering the overlap with the visible range.
    grid = _CIE_LAMBDA[(_CIE_LAMBDA >= lam[0]) & (_CIE_LAMBDA <= lam[-1])]
    if grid.size == 0:
        return np.zeros(3, dtype=np.float32)
    dense = np.interp(grid, lam, val)
    x = np.trapezoid(dense * cie_x(grid), grid) / CIE_Y_INTEGRAL
    y = np.trapezoid(dense * cie_y(grid), grid) / CIE_Y_INTEGRAL
    z = np.trapezoid(dense * cie_z(grid), grid) / CIE_Y_INTEGRAL
    rgb = XYZ_TO_RGB @ np.array([x, y, z])
    return np.maximum(rgb, 0.0).astype(np.float32)


def temperature_to_rgb(temperature_k):
    """Blackbody temperature -> normalized linear RGB.
    [ref: radiometry/src/spectrum.rs:39-55]"""
    lam = _CIE_LAMBDA
    spd = blackbody_normalized(lam, temperature_k)
    return sampled_spectrum_to_rgb(lam, spd)
