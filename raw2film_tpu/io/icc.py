"""ICC display / soft-proof transforms.

The reference applies an ICC transform by baking it into the 33^3 output LUT
through LittleCMS (reference: src/raw2film/cpu_processor.py:255-263,
gui.py:2771-2934 for display/softproof setup) — the image itself never pays
for color management. Here the same bake targets either a tabulated output
LUT or a post-render uint8 image, through PIL's ImageCms when available
(gracefully unavailable otherwise).
"""

from __future__ import annotations

import numpy as np


def have_icc() -> bool:
    try:
        from PIL import ImageCms  # noqa: F401

        return True
    except ImportError:
        return False


def build_transform(display_profile_path: str, intent: int = 0):
    """sRGB -> display-profile transform (None if ICC support is missing)."""
    try:
        from PIL import ImageCms
    except ImportError:
        return None
    srgb = ImageCms.createProfile("sRGB")
    dst = ImageCms.getOpenProfile(display_profile_path)
    return ImageCms.buildTransform(
        srgb, dst, "RGB", "RGB", renderingIntent=intent
    )


def build_softproof_transform(
    proof_profile_path: str, display_profile_path: str | None = None, intent: int = 0
):
    try:
        from PIL import ImageCms
    except ImportError:
        return None
    srgb = ImageCms.createProfile("sRGB")
    proof = ImageCms.getOpenProfile(proof_profile_path)
    dst = (
        ImageCms.getOpenProfile(display_profile_path)
        if display_profile_path
        else srgb
    )
    return ImageCms.buildProofTransform(
        srgb, dst, proof, "RGB", "RGB", renderingIntent=intent
    )


def apply_transform_to_lut(lut: np.ndarray, transform) -> np.ndarray:
    """Bake an ICC transform into a (N, N, N, 3) float LUT (the reference's
    cheap-LUT-not-image strategy, cpu_processor.py:255-263)."""
    if transform is None:
        return lut
    from PIL import Image, ImageCms

    shape = lut.shape
    u8 = (np.clip(lut, 0, 1) * 255).astype(np.uint8).reshape(shape[0], -1, 3)
    img = Image.fromarray(u8)
    ImageCms.applyTransform(img, transform, inPlace=True)
    return (np.asarray(img, np.uint8).reshape(shape) / 255.0).astype(np.float32)


def apply_transform_to_image(image_hwc_u8: np.ndarray, transform) -> np.ndarray:
    if transform is None:
        return image_hwc_u8
    from PIL import Image, ImageCms

    img = Image.fromarray(np.ascontiguousarray(image_hwc_u8))
    ImageCms.applyTransform(img, transform, inPlace=True)
    return np.asarray(img, np.uint8)
