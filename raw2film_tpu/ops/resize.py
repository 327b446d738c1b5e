"""Resolution scaling on device.

Reference semantics (src/raw2film/utils.py:226-244): preserve aspect with the
*min* of the H/W factors; INTER_AREA when shrinking, LANCZOS4 when enlarging.
Device mapping: integer-factor shrink = exact box mean; fractional shrink =
anti-aliased linear resize; enlarge = Lanczos-5 (closest jax.image kernel to
OpenCV's LANCZOS4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raw2film_tpu.ops import conv as convops


def resolution_scaling(img: jnp.ndarray, resolution: tuple[int, int]) -> jnp.ndarray:
    """img (C, H, W) -> scaled so it fits ``resolution`` (H, W), aspect kept."""
    c, h, w = img.shape
    factor = min(resolution[0] / h, resolution[1] / w)
    if abs(factor - 1.0) < 1e-9:
        return img
    out_hw = (round(h * factor), round(w * factor))
    if factor < 1.0:
        inv = 1.0 / factor
        if abs(inv - round(inv)) < 1e-9 and h % round(inv) == 0 and w % round(inv) == 0:
            return convops.box_downsample(img, round(inv))
        return jax.image.resize(img, (c, *out_hw), method="linear", antialias=True)
    return jax.image.resize(img, (c, *out_hw), method="lanczos5")
