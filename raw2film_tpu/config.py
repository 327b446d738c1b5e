"""Global configuration constants.

Mirrors the role of the reference's ``spectral_film_lut.config``
(reference: src/raw2film/raw_conversion.py:10 imports DEFAULT_DTYPE).
"""

import numpy as np

DEFAULT_DTYPE = np.float32
"""Pipeline float dtype for host-side LUT construction and the device chain."""

LOG_EXPOSURE_MIN = -4.0
"""Lower edge of the log10-relative-exposure grid for H&D curves."""

LOG_EXPOSURE_MAX = 2.0
"""Upper edge of the log10-relative-exposure grid for H&D curves."""

DENSITY_CURVE_SIZE = 512
"""Samples in a 1D H&D density curve LUT."""

INPUT_LUT_SIZE = 128
"""Side length of the 2D chromaticity input LUT."""

PRINT_LUT_SIZE = 33
"""Side length of the 3D print/output LUT."""

LINEAR_SCALING = 4.0
"""Density-domain scale baked into the 3D LUT: LUT coords = density / 4
(reference: src/raw2film/cpu_processor.py:251 ``linear_scaling=4.0`` and
cpu_processor.py:405 ``apply_lut_tetrahedral(image, lut, 0.25)``)."""

LOG10_EPS = 1e-6
"""Clip floor before log10 (reference: shaders/lut_1d.wgsl safe_log10_vec3)."""


def enable_persistent_jit_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a per-user directory so a
    render configuration compiles once per machine, not once per session
    (a cold compile of a fresh config takes minutes through a remote-compile
    TPU tunnel; the reference's analogue is its 16 pre-built WGSL pipelines).
    Called by Processor on construction; safe to call repeatedly."""
    import os

    import jax

    cache = path or os.path.expanduser("~/.raw2film_tpu/jit_cache")
    try:
        if path is None and (
            os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or getattr(jax.config, "jax_compilation_cache_dir", None)
        ):
            return  # respect a user-configured cache location
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only home: run without the cache
