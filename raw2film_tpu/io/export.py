"""Image export: JPEG/TIFF save with EXIF carry-over.

Reference behavior: PIL JPEG save at chosen quality, then exiftool re-attaches
whitelisted EXIF keys + ExposureCompensation (reference:
src/raw2film/gui.py:2285-2355, utils.py:82-90). exiftool isn't assumed here;
EXIF is written directly through PIL's Exif container.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from raw2film_tpu.data import METADATA_KEYS

# PIL / piexif tag ids for the subset we can re-attach without exiftool.
_EXIF_TAG_IDS = {
    "Make": 271,
    "Model": 272,
    "ExposureTime": 33434,
    "FNumber": 33437,
    "ISO": 34855,
    "FocalLength": 37386,
    "LensModel": 42036,
    "ExposureCompensation": 37380,
    "DateTimeOriginal": 36867,
    "Software": 305,
}


def build_exif(metadata: dict, exp_comp: float | None = None) -> Image.Exif:
    """Whitelisted EXIF dict -> PIL Exif object."""
    exif = Image.Exif()
    for key, value in (metadata or {}).items():
        name = key.split(":")[-1]
        if name not in METADATA_KEYS:
            continue
        tag = _EXIF_TAG_IDS.get(name)
        if tag is None:
            continue
        try:
            exif[tag] = value
        except Exception:
            pass
    if exp_comp is not None:
        exif[_EXIF_TAG_IDS["ExposureCompensation"]] = float(exp_comp)
    exif[_EXIF_TAG_IDS["Software"]] = "raw2film-tpu"
    return exif


def save_image(
    image_hwc: np.ndarray,
    dst: str,
    quality: int = 95,
    metadata: dict | None = None,
    exp_comp: float | None = None,
) -> None:
    """uint8 (H, W, 3) -> JPEG/TIFF/PNG by extension, EXIF attached."""
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    img = Image.fromarray(np.ascontiguousarray(image_hwc))
    ext = os.path.splitext(dst)[1].lower()
    kwargs = {"exif": build_exif(metadata, exp_comp)}
    if ext in (".jpg", ".jpeg"):
        kwargs.update(quality=quality, subsampling=0)
    img.save(dst, **kwargs)
