"""Color-difference metrics for the fidelity gates (host, float64).

CIEDE2000 per Sharma, Wu & Dalal (2005), "The CIEDE2000 color-difference
formula: Implementation notes, supplementary test data, and mathematical
observations" — the standard reference implementation recipe.
"""

from __future__ import annotations

import numpy as np


def srgb_float_to_lab(f: np.ndarray, white=(0.95047, 1.0, 1.08883)) -> np.ndarray:
    """(..., 3) or (3, H, W) sRGB-encoded float [0,1] -> CIE L*a*b* (D65)."""
    x = np.asarray(f, np.float64)
    if x.shape[0] == 3 and x.ndim == 3:
        x = np.moveaxis(x, 0, -1)
    lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    m = np.array(
        [
            [0.4123908, 0.35758434, 0.18048079],
            [0.21263901, 0.71516868, 0.07219232],
            [0.01933082, 0.11919478, 0.95053215],
        ]
    )
    xyz = lin @ m.T
    xyz = xyz / np.asarray(white)
    eps, kappa = 216 / 24389, 24389 / 27
    f = np.where(xyz > eps, np.cbrt(xyz), (kappa * xyz + 16) / 116)
    L = 116 * f[..., 1] - 16
    a = 500 * (f[..., 0] - f[..., 1])
    b = 200 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def ciede2000(lab1: np.ndarray, lab2: np.ndarray) -> np.ndarray:
    """Elementwise CIEDE2000 between two (..., 3) Lab arrays."""
    L1, a1, b1 = (lab1[..., i] for i in range(3))
    L2, a2, b2 = (lab2[..., i] for i in range(3))
    C1 = np.hypot(a1, b1)
    C2 = np.hypot(a2, b2)
    Cbar = 0.5 * (C1 + C2)
    G = 0.5 * (1 - np.sqrt(Cbar**7 / (Cbar**7 + 25.0**7)))
    ap1 = (1 + G) * a1
    ap2 = (1 + G) * a2
    Cp1 = np.hypot(ap1, b1)
    Cp2 = np.hypot(ap2, b2)
    hp1 = np.degrees(np.arctan2(b1, ap1)) % 360
    hp2 = np.degrees(np.arctan2(b2, ap2)) % 360
    hp1 = np.where((Cp1 == 0), 0.0, hp1)
    hp2 = np.where((Cp2 == 0), 0.0, hp2)

    dLp = L2 - L1
    dCp = Cp2 - Cp1
    dh = hp2 - hp1
    dh = np.where(dh > 180, dh - 360, dh)
    dh = np.where(dh < -180, dh + 360, dh)
    dh = np.where(Cp1 * Cp2 == 0, 0.0, dh)
    dHp = 2 * np.sqrt(Cp1 * Cp2) * np.sin(np.radians(dh) / 2)

    Lbp = 0.5 * (L1 + L2)
    Cbp = 0.5 * (Cp1 + Cp2)
    hsum = hp1 + hp2
    hdiff = np.abs(hp1 - hp2)
    hbp = np.where(
        Cp1 * Cp2 == 0,
        hsum,
        np.where(
            hdiff <= 180,
            0.5 * hsum,
            np.where(hsum < 360, 0.5 * (hsum + 360), 0.5 * (hsum - 360)),
        ),
    )
    T = (
        1
        - 0.17 * np.cos(np.radians(hbp - 30))
        + 0.24 * np.cos(np.radians(2 * hbp))
        + 0.32 * np.cos(np.radians(3 * hbp + 6))
        - 0.20 * np.cos(np.radians(4 * hbp - 63))
    )
    dtheta = 30 * np.exp(-(((hbp - 275) / 25) ** 2))
    Rc = 2 * np.sqrt(Cbp**7 / (Cbp**7 + 25.0**7))
    Sl = 1 + 0.015 * (Lbp - 50) ** 2 / np.sqrt(20 + (Lbp - 50) ** 2)
    Sc = 1 + 0.045 * Cbp
    Sh = 1 + 0.015 * Cbp * T
    Rt = -np.sin(np.radians(2 * dtheta)) * Rc
    return np.sqrt(
        (dLp / Sl) ** 2
        + (dCp / Sc) ** 2
        + (dHp / Sh) ** 2
        + Rt * (dCp / Sc) * (dHp / Sh)
    )


def srgb_u8_to_lab(u8: np.ndarray, white=(0.95047, 1.0, 1.08883)) -> np.ndarray:
    """(..., 3) or (3, H, W) sRGB uint8 -> CIE L*a*b* (D65)."""
    return srgb_float_to_lab(np.asarray(u8, np.float64) / 255.0, white)


def delta_e_2000_u8(a_u8: np.ndarray, b_u8: np.ndarray) -> np.ndarray:
    """CIEDE2000 between two uint8 sRGB images (3, H, W) or (..., 3)."""
    return ciede2000(srgb_u8_to_lab(a_u8), srgb_u8_to_lab(b_u8))


def delta_e_2000_float(a_f: np.ndarray, b_f: np.ndarray) -> np.ndarray:
    """CIEDE2000 between two sRGB-encoded float images in [0, 1].

    The pre-quantization form of the fidelity gate: at an 8-bit rounding
    boundary, two pipelines that agree to f32 epsilon can still land one
    code apart after uint8 encode, which reads as ΔE ≈ 1 — quantization,
    not color error. Comparing the encoded floats measures the pipelines
    themselves.
    """
    return ciede2000(srgb_float_to_lab(a_f), srgb_float_to_lab(b_f))
