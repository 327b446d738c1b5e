"""Parameter-surface parity with the reference, pinned.

Two layers mirror the reference exactly:

* the SETTINGS schema (ProfileParams/ImageParams) = the GUI's
  dflt_prf_params ∪ dflt_img_params (reference src/raw2film/gui.py:486-531)
  — this is what makes the reference's raw2film_settings.json sidecars and
  QSettings profiles port over unchanged;
* the Processor.process() keyword surface and ITS defaults = the
  reference's CpuProcessor.process signature
  (src/raw2film/cpu_processor.py:269-317) — note the reference itself uses
  different defaults at the two layers (exp_kelvin 6500 vs 6000,
  halation_green_factor 0.4 vs 0.3): the GUI merge overrides the API
  defaults, and so does ours.
"""

import dataclasses
import inspect

from raw2film_tpu.pipeline.params import ImageParams, ProfileParams, merge_params
from raw2film_tpu.pipeline.processor import Processor

# Transcribed from reference gui.py:486-531.
REF_PRF = {
    "negative_film": "Kodak Portra 400",
    "print_film": "Fuji Crystal Archive Maxima",
    "red_light": 0, "green_light": 0, "blue_light": 0,
    "halation": True, "sharpness": True, "grain": 2,
    "film_format": "135", "frame_width": 36, "frame_height": 24,
    "grain_size": 6, "halation_size": 1.0, "halation_green_factor": 0.3,
    "projector_kelvin": 6500, "inversion_gamma": 4.0,
    "idealized_curve": False, "halation_intensity": 1, "shadow_comp": 0,
    "white_clip": False, "white_balance": False, "sat_adjust": 1,
    "grain_sigma": 0.4, "gamma_func": "sRGB", "push_pull": 0.0,
    "sharpening_strength": 0.0, "sharpening_sigma": 1.0,
    "color_masking": 1.0,
}
REF_IMG = {
    "exp_comp": 0, "zoom": 1, "rotate_times": 0, "rotation": 0,
    "exp_kelvin": 6000, "profile": "Default", "canvas_mode": "No",
    "canvas_scale": 1.0, "canvas_ratio": 0.8, "highlight_burn": 0,
    "burn_scale": 50, "flip": False, "tint": 0, "chroma_nr": 0,
}

# Transcribed from reference cpu_processor.py:269-317 (kwargs with
# defaults; positional/src/stock args and engine-internal knobs excluded).
REF_PROCESS_DEFAULTS = {
    "exp_comp": 0.0, "red_light": 0.0, "green_light": 0.0,
    "blue_light": 0.0, "projector_kelvin": 6500, "shadow_comp": 0.0,
    "sat_adjust": 1.0, "gamma_func": "sRGB", "exp_kelvin": 6500,
    "tint": 0.0, "inversion_gamma": 4.0, "idealized_curve": False,
    "inversion": False, "push_pull": 0.0, "white_balance": False,
    "white_clip": False, "resolution": None, "frame_width": 36,
    "frame_height": 24, "rotation": 0.0, "zoom": 1.0, "rotate_times": 0,
    "flip": False, "cam": None, "lens": None, "canvas_mode": "No",
    "canvas_scale": 1.0, "canvas_ratio": 1.0, "halation_intensity": 1.0,
    "halation": True, "halation_size": 1.0, "halation_green_factor": 0.4,
    "sharpness": True, "sharpening_strength": 0.0,
    "sharpening_sigma": 1.0, "chroma_nr": 0, "grain": 2,
    "highlight_burn": 0.0, "burn_scale": 50.0, "half_size": True,
    "cache": True,
}


def _num_eq(a, b):
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def test_settings_schema_keys_and_defaults_match_reference_gui():
    ours = {f.name for f in dataclasses.fields(ProfileParams)} | {
        f.name for f in dataclasses.fields(ImageParams)
    }
    ref = set(REF_PRF) | set(REF_IMG)
    assert ref - ours == set(), ref - ours
    # r2f-only extensions: documented additions with parity-preserving
    # defaults (reference sidecars still port unchanged; ours carry the
    # extra key). mtf_fidelity: signed MTF kernels (ops/mtf.py).
    assert ours - ref == {"mtf_fidelity"}, ours - ref
    merged = merge_params()
    for k, v in {**REF_PRF, **REF_IMG}.items():
        assert _num_eq(merged[k], v), (k, merged[k], v)


def test_process_signature_defaults_match_reference_api():
    sig = inspect.signature(Processor.process)
    for k, v in REF_PROCESS_DEFAULTS.items():
        assert k in sig.parameters, f"process() missing reference kwarg {k}"
        ours = sig.parameters[k].default
        assert _num_eq(ours, v), (k, ours, v)
