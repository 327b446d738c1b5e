"""The film stock database.

Role of the reference's ``spectral_film_lut.film_loader`` (reference:
src/raw2film/__main__.py:27-31 loads a dict[str, FilmSpectral]). Stocks here
are original parametric definitions for this framework: plausible,
differentiated characterizations authored from public sensitometric knowledge
(ISO speeds, contrast, granularity class, spectral balance), not datasheet
scans.
"""

from __future__ import annotations

from functools import lru_cache

from raw2film_tpu.film.sensitometry import HDCurve
from raw2film_tpu.film.stock import (
    DyeSet,
    FilmStock,
    GrainModel,
    MTFModel,
    Sensitivities,
)


def _neg_curve(gamma, dmin=(0.20, 0.62, 0.90), speed=0.0, latitude=3.1, toe=0.35, sh=0.5):
    """Color-negative H&D curve. ``speed`` shifts the whole curve in stops of
    extra sensitivity (curve moves left); latitude = straight-line span."""
    g = gamma if isinstance(gamma, (tuple, list)) else (gamma, gamma * 1.045, gamma * 1.09)
    x_toe = -2.45 - speed * 0.301
    return HDCurve(
        d_min=tuple(dmin),
        gamma=tuple(g),
        x_toe=(x_toe, x_toe, x_toe),
        x_shoulder=(x_toe + latitude,) * 3,
        w_toe=(toe,) * 3,
        w_shoulder=(sh,) * 3,
    )


def _bw_curve(gamma=0.65, dmin=0.12, speed=0.0, latitude=3.3):
    x_toe = -2.4 - speed * 0.301
    return HDCurve(
        d_min=(dmin,),
        gamma=(gamma,),
        x_toe=(x_toe,),
        x_shoulder=(x_toe + latitude,),
        w_toe=(0.4,),
        w_shoulder=(0.55,),
    )


def _slide_curve(gamma=-1.7, dmax=3.5, dmin=0.12, latitude=2.0):
    """Reversal: density falls with exposure (gamma < 0); d_min field holds
    the high (unexposed) density end. Curve is placed so mid-grey
    (logE = -0.745) develops to density ~1.0 — the standard slide aim."""
    x_toe = -0.745 - (dmax - 1.0) / abs(gamma)
    return HDCurve(
        d_min=(dmax, dmax, dmax),
        gamma=(gamma, gamma * 1.02, gamma * 1.05),
        x_toe=(x_toe,) * 3,
        x_shoulder=(x_toe + (dmax - dmin) / abs(gamma),) * 3,
        w_toe=(0.28,) * 3,
        w_shoulder=(0.22,) * 3,
    )


def _bw_paper_curve(gamma=2.0, dmin=0.06, dmax=2.15):
    """Single-layer silver-gelatin paper curve (grade ~ gamma)."""
    lat = (dmax - dmin) / gamma
    return HDCurve(
        d_min=(dmin,),
        gamma=(gamma,),
        x_toe=(-1.45 - lat / 2,),
        x_shoulder=(-1.45 + lat / 2,),
        w_toe=(0.20,),
        w_shoulder=(0.16,),
    )


def _paper_curve(gamma=2.8, dmin=0.07, dmax=2.35):
    lat = (dmax - dmin) / gamma
    return HDCurve(
        d_min=(dmin, dmin * 1.1, dmin * 1.25),
        gamma=(gamma, gamma * 1.02, gamma * 1.05),
        x_toe=(-1.45 - lat / 2,) * 3,
        x_shoulder=(-1.45 + lat / 2,) * 3,
        w_toe=(0.22,) * 3,
        w_shoulder=(0.18,) * 3,
    )


def _stocks() -> list[FilmStock]:
    s: list[FilmStock] = []

    # ----------------------------------------------------- color negatives
    s.append(
        FilmStock(
            name="Kodak Portra 400",
            manufacturer="Kodak",
            year=2010,
            iso=400,
            resolution=115,
            curve=_neg_curve(0.60, speed=0.0, latitude=3.4, toe=0.42, sh=0.62),
            sens=Sensitivities(peaks=(642.0, 549.0, 467.0), widths=(37.0, 36.0, 33.0)),
            grain=GrainModel(rms=4.3),
            mtf_model=MTFModel(f50=52.0, adj=0.28),
            comment="Soft, wide-latitude portrait negative.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Portra 160",
            manufacturer="Kodak",
            year=2011,
            iso=160,
            resolution=125,
            curve=_neg_curve(0.58, latitude=3.3, toe=0.40, sh=0.60),
            sens=Sensitivities(peaks=(642.0, 549.0, 467.0), widths=(36.0, 35.0, 32.0)),
            grain=GrainModel(rms=3.2),
            mtf_model=MTFModel(f50=60.0, adj=0.26),
        )
    )
    s.append(
        FilmStock(
            name="Kodak Portra 800",
            manufacturer="Kodak",
            year=1998,
            iso=800,
            resolution=100,
            curve=_neg_curve(0.61, latitude=3.2, toe=0.45, sh=0.62),
            grain=GrainModel(rms=5.9),
            mtf_model=MTFModel(f50=44.0, adj=0.30),
        )
    )
    s.append(
        FilmStock(
            name="Kodak Ektar 100",
            manufacturer="Kodak",
            year=2008,
            iso=100,
            resolution=160,
            curve=_neg_curve(0.72, latitude=2.8, toe=0.30, sh=0.45),
            sens=Sensitivities(peaks=(648.0, 546.0, 462.0), widths=(33.0, 33.0, 30.0)),
            dyes=DyeSet(unwanted=(0.08, 0.13, 0.03)),
            grain=GrainModel(rms=2.6),
            mtf_model=MTFModel(f50=80.0, adj=0.33),
            comment="Saturated, ultra-fine-grain landscape negative.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Gold 200",
            manufacturer="Kodak",
            year=1997,
            iso=200,
            resolution=100,
            curve=_neg_curve(0.66, dmin=(0.22, 0.66, 0.98), latitude=3.0),
            grain=GrainModel(rms=4.8),
            mtf_model=MTFModel(f50=50.0, adj=0.27),
        )
    )
    s.append(
        FilmStock(
            name="Fuji Pro 400H",
            manufacturer="Fujifilm",
            year=2004,
            iso=400,
            resolution=110,
            # Pastel, cool-leaning: soft per-channel contrast spread (greens
            # slightly favored), broader sensitivities, softer dye purity.
            curve=HDCurve(
                d_min=(0.18, 0.60, 0.92),
                gamma=(0.565, 0.615, 0.635),
                x_toe=(-2.45, -2.45, -2.45),
                x_shoulder=(0.95, 0.95, 0.95),
                w_toe=(0.5, 0.45, 0.45),
                w_shoulder=(0.62, 0.62, 0.62),
            ),
            sens=Sensitivities(peaks=(634.0, 554.0, 472.0), widths=(42.0, 41.0, 37.0)),
            dyes=DyeSet(unwanted=(0.16, 0.22, 0.06)),
            color_masking_strength=0.16,
            grain=GrainModel(rms=4.5),
            mtf_model=MTFModel(f50=50.0, adj=0.26),
            comment="Cool-leaning, pastel 4th-layer negative.",
        )
    )
    s.append(
        FilmStock(
            name="Fuji Superia X-Tra 400",
            manufacturer="Fujifilm",
            year=1998,
            iso=400,
            resolution=105,
            curve=_neg_curve(0.65, dmin=(0.21, 0.64, 0.96), latitude=3.1),
            sens=Sensitivities(peaks=(637.0, 553.0, 469.0), widths=(37.0, 37.0, 33.0)),
            grain=GrainModel(rms=5.2),
            mtf_model=MTFModel(f50=48.0, adj=0.28),
        )
    )
    s.append(
        FilmStock(
            name="Kodak Vision3 50D",
            manufacturer="Kodak",
            year=2012,
            iso=50,
            resolution=175,
            curve=_neg_curve(0.55, dmin=(0.18, 0.55, 0.85), latitude=3.8, toe=0.40, sh=0.70),
            grain=GrainModel(rms=2.4),
            mtf_model=MTFModel(f50=85.0, adj=0.32),
            comment="Motion-picture daylight negative.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Vision3 250D",
            manufacturer="Kodak",
            year=2009,
            iso=250,
            resolution=140,
            curve=_neg_curve(0.55, dmin=(0.19, 0.57, 0.87), latitude=3.8, toe=0.42, sh=0.70),
            grain=GrainModel(rms=3.4),
            mtf_model=MTFModel(f50=65.0, adj=0.30),
        )
    )
    s.append(
        FilmStock(
            name="Kodak Vision3 500T",
            manufacturer="Kodak",
            year=2007,
            iso=500,
            native_kelvin=3200.0,
            resolution=120,
            curve=_neg_curve(0.56, dmin=(0.20, 0.58, 0.88), latitude=3.7, toe=0.45, sh=0.70),
            sens=Sensitivities(peaks=(645.0, 550.0, 463.0), widths=(38.0, 36.0, 33.0)),
            grain=GrainModel(rms=4.6),
            mtf_model=MTFModel(f50=55.0, adj=0.30),
            comment="Tungsten-balanced motion-picture negative.",
        )
    )
    s.append(
        FilmStock(
            name="CineStill 800T",
            manufacturer="CineStill",
            year=2012,
            iso=800,
            native_kelvin=3200.0,
            resolution=110,
            curve=_neg_curve(0.56, dmin=(0.16, 0.54, 0.84), latitude=3.6, toe=0.45, sh=0.68),
            sens=Sensitivities(peaks=(645.0, 550.0, 463.0), widths=(38.0, 36.0, 33.0)),
            grain=GrainModel(rms=5.4),
            mtf_model=MTFModel(f50=52.0, adj=0.30),
            comment="Remjet-removed 500T: prone to strong red halation.",
        )
    )

    s.append(
        FilmStock(
            name="Fuji C200",
            manufacturer="Fujifilm",
            year=2001,
            iso=200,
            resolution=100,
            curve=_neg_curve(0.63, dmin=(0.20, 0.63, 0.94), latitude=3.0),
            sens=Sensitivities(peaks=(636.0, 555.0, 470.0), widths=(38.0, 38.0, 34.0)),
            grain=GrainModel(rms=5.0),
            mtf_model=MTFModel(f50=47.0, adj=0.26),
            comment="Budget daily-driver with a green-leaning palette.",
        )
    )
    s.append(
        FilmStock(
            name="Agfa Vista 200",
            manufacturer="Agfa",
            year=1999,
            iso=200,
            resolution=95,
            curve=_neg_curve(0.64, dmin=(0.23, 0.68, 1.00), latitude=2.9),
            sens=Sensitivities(peaks=(645.0, 550.0, 462.0), widths=(40.0, 39.0, 35.0)),
            grain=GrainModel(rms=5.2),
            mtf_model=MTFModel(f50=46.0, adj=0.25),
            comment="Warm consumer negative: red-forward, sunny-day palette.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Ultramax 400",
            manufacturer="Kodak",
            year=1997,
            iso=400,
            resolution=100,
            curve=_neg_curve(0.63, latitude=3.0, toe=0.40, sh=0.58),
            sens=Sensitivities(peaks=(646.0, 550.0, 463.0), widths=(41.0, 40.0, 36.0)),
            grain=GrainModel(rms=5.6),
            mtf_model=MTFModel(f50=46.0, adj=0.26),
            comment="Consumer 400 negative: warm, forgiving, visibly grainy.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak ColorPlus 200",
            manufacturer="Kodak",
            year=2007,
            iso=200,
            resolution=100,
            curve=_neg_curve(0.63, dmin=(0.22, 0.66, 0.98), latitude=2.9, toe=0.38),
            sens=Sensitivities(peaks=(644.0, 551.0, 464.0), widths=(43.0, 41.0, 37.0)),
            grain=GrainModel(rms=5.0),
            mtf_model=MTFModel(f50=44.0, adj=0.24),
            comment="Budget Kodacolor-lineage emulsion: muted, vintage palette.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Aerocolor IV 125",
            manufacturer="Kodak",
            year=1998,
            iso=125,
            resolution=125,
            # Unmasked aerial negative (SO-250 class): near-neutral base
            # instead of the C-41 orange mask, no masking couplers, higher
            # native gamma than portrait films.
            color_masking_strength=0.0,
            curve=_neg_curve(
                0.74, dmin=(0.14, 0.16, 0.19), latitude=2.9, toe=0.32, sh=0.5
            ),
            sens=Sensitivities(peaks=(648.0, 548.0, 462.0), widths=(38.0, 37.0, 34.0)),
            grain=GrainModel(rms=3.9),
            mtf_model=MTFModel(f50=72.0, adj=0.30),
            alias=("Santacolor 100", "Flic Film Elektra 100"),
            comment="Unmasked aerial color negative (the 'Santacolor' respools).",
        )
    )
    s.append(
        FilmStock(
            name="Fuji Natura 1600",
            manufacturer="Fujifilm",
            year=2004,
            iso=1600,
            resolution=85,
            curve=_neg_curve(0.62, latitude=3.1, toe=0.46, sh=0.60),
            sens=Sensitivities(peaks=(648.0, 545.0, 460.0), widths=(43.0, 41.0, 37.0)),
            grain=GrainModel(rms=8.2),
            mtf_model=MTFModel(f50=36.0, adj=0.28),
            comment="Highest-speed consumer color negative (Natura P mode).",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Portra 160 NC",
            manufacturer="Kodak",
            year=1998,
            iso=160,
            resolution=120,
            alias=("Portra NC",),
            curve=_neg_curve(0.54, latitude=3.5, toe=0.48, sh=0.66),
            sens=Sensitivities(peaks=(642.0, 549.0, 467.0), widths=(38.0, 37.0, 34.0)),
            dyes=DyeSet(unwanted=(0.14, 0.20, 0.05)),
            grain=GrainModel(rms=3.4),
            mtf_model=MTFModel(f50=55.0, adj=0.24),
            comment="Neutral-contrast wedding classic (pre-2010 Portra).",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Portra 160 VC",
            manufacturer="Kodak",
            year=1998,
            iso=160,
            resolution=120,
            alias=("Portra VC",),
            curve=_neg_curve(0.66, latitude=3.0, toe=0.36, sh=0.5),
            sens=Sensitivities(peaks=(644.0, 548.0, 465.0), widths=(35.0, 34.0, 31.0)),
            dyes=DyeSet(unwanted=(0.09, 0.14, 0.03)),
            grain=GrainModel(rms=3.6),
            mtf_model=MTFModel(f50=55.0, adj=0.28),
            comment="Vivid-contrast sibling of the NC.",
        )
    )

    s.append(
        FilmStock(
            name="Kodak Vision3 200T",
            manufacturer="Kodak",
            year=2010,
            iso=200,
            native_kelvin=3200.0,
            resolution=150,
            curve=_neg_curve(0.55, dmin=(0.19, 0.56, 0.86), latitude=3.8, toe=0.43, sh=0.70),
            sens=Sensitivities(peaks=(645.0, 550.0, 463.0), widths=(38.0, 36.0, 33.0)),
            grain=GrainModel(rms=3.0),
            mtf_model=MTFModel(f50=70.0, adj=0.30),
            comment="Tungsten-balanced mid-speed motion-picture negative.",
        )
    )
    s.append(
        FilmStock(
            name="Fuji Superia 1600",
            manufacturer="Fujifilm",
            year=2000,
            iso=1600,
            resolution=85,
            curve=_neg_curve(0.63, dmin=(0.23, 0.66, 0.98), speed=0.2, latitude=2.9, toe=0.48, sh=0.6),
            sens=Sensitivities(peaks=(637.0, 553.0, 469.0), widths=(39.0, 39.0, 35.0)),
            grain=GrainModel(rms=8.5),
            mtf_model=MTFModel(f50=38.0, adj=0.30),
            comment="Push-speed party film: coarse grain, lifted base fog.",
        )
    )

    s.append(
        FilmStock(
            name="Lomography Color Negative 800",
            manufacturer="Lomography",
            year=2010,
            iso=800,
            resolution=95,
            curve=_neg_curve(0.64, dmin=(0.22, 0.66, 0.97), latitude=3.1, toe=0.46, sh=0.6),
            sens=Sensitivities(peaks=(640.0, 552.0, 468.0), widths=(39.0, 38.0, 34.0)),
            grain=GrainModel(rms=6.5),
            mtf_model=MTFModel(f50=42.0, adj=0.28),
            comment="Warm, saturated high-speed consumer negative.",
        )
    )

    # ----------------------------------------------------- black & white
    s.append(
        FilmStock(
            name="Kodak Tri-X 400",
            manufacturer="Kodak",
            year=1954,
            iso=400,
            resolution=100,
            density_measure="bw",
            curve=_bw_curve(0.68, dmin=0.14, latitude=3.3),
            grain=GrainModel(rms=6.3, floor=0.22),
            mtf_model=MTFModel(f50=55.0, adj=0.38),
            comment="The classic high-acutance BW press film.",
        )
    )
    s.append(
        FilmStock(
            name="Ilford HP5 Plus 400",
            manufacturer="Ilford",
            year=1989,
            iso=400,
            resolution=95,
            density_measure="bw",
            curve=_bw_curve(0.62, dmin=0.12, latitude=3.5),
            grain=GrainModel(rms=5.8, floor=0.2),
            mtf_model=MTFModel(f50=50.0, adj=0.33),
        )
    )
    s.append(
        FilmStock(
            name="Ilford Delta 100",
            manufacturer="Ilford",
            year=1992,
            iso=100,
            resolution=160,
            density_measure="bw",
            curve=_bw_curve(0.70, dmin=0.10, latitude=3.0),
            grain=GrainModel(rms=2.8, floor=0.18),
            mtf_model=MTFModel(f50=90.0, adj=0.30),
        )
    )

    s.append(
        FilmStock(
            name="Fuji Acros 100",
            manufacturer="Fujifilm",
            year=2002,
            iso=100,
            resolution=180,
            density_measure="bw",
            curve=_bw_curve(0.66, dmin=0.09, latitude=3.2),
            grain=GrainModel(rms=2.2, floor=0.16),
            mtf_model=MTFModel(f50=95.0, adj=0.32),
            comment="Ultra-fine orthopanchromatic BW.",
        )
    )
    s.append(
        FilmStock(
            name="Fomapan 400",
            manufacturer="Foma",
            year=1995,
            iso=400,
            resolution=90,
            density_measure="bw",
            curve=_bw_curve(0.60, dmin=0.16, latitude=3.1),
            grain=GrainModel(rms=7.2, floor=0.25),
            mtf_model=MTFModel(f50=45.0, adj=0.36),
            comment="Gritty budget BW with pronounced grain.",
        )
    )

    s.append(
        FilmStock(
            name="Kodak T-Max 100",
            manufacturer="Kodak",
            year=1986,
            iso=100,
            resolution=200,
            density_measure="bw",
            curve=_bw_curve(0.70, dmin=0.08, latitude=3.0),
            grain=GrainModel(rms=1.9, floor=0.14),
            mtf_model=MTFModel(f50=110.0, adj=0.30),
            comment="Tabular-grain technical BW: the resolution champion.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak T-Max 400",
            manufacturer="Kodak",
            year=1986,
            iso=400,
            resolution=125,
            density_measure="bw",
            curve=_bw_curve(0.67, dmin=0.10, latitude=3.2),
            grain=GrainModel(rms=3.6, floor=0.18),
            mtf_model=MTFModel(f50=75.0, adj=0.32),
            comment="Fast tabular-grain BW: Tri-X speed, Delta-class grain.",
        )
    )
    s.append(
        FilmStock(
            name="Ilford FP4 Plus 125",
            manufacturer="Ilford",
            year=1990,
            iso=125,
            resolution=145,
            density_measure="bw",
            curve=_bw_curve(0.63, dmin=0.11, latitude=3.4),
            grain=GrainModel(rms=3.4, floor=0.19),
            mtf_model=MTFModel(f50=72.0, adj=0.31),
            comment="Classic cubic-grain mid-speed BW with a gentle shoulder.",
        )
    )
    s.append(
        FilmStock(
            name="Ilford Delta 3200",
            manufacturer="Ilford",
            year=1998,
            iso=3200,
            resolution=70,
            density_measure="bw",
            curve=_bw_curve(0.58, dmin=0.22, speed=0.3, latitude=2.8),
            grain=GrainModel(rms=11.0, floor=0.30),
            mtf_model=MTFModel(f50=32.0, adj=0.34),
            comment="Ultra-speed low-light BW: heavy grain, soft gradation.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak T-Max P3200",
            manufacturer="Kodak",
            year=1988,
            iso=3200,
            resolution=75,
            density_measure="bw",
            curve=_bw_curve(0.60, dmin=0.25, speed=0.25, latitude=2.9),
            grain=GrainModel(rms=10.0, floor=0.28),
            mtf_model=MTFModel(f50=36.0, adj=0.32),
            comment="T-grain push monochrome (EI 800 native): tighter grain "
            "than Delta 3200, crisper mids.",
        )
    )
    s.append(
        FilmStock(
            name="Fuji Neopan 1600",
            manufacturer="Fujifilm",
            year=1990,
            iso=1600,
            resolution=85,
            density_measure="bw",
            curve=_bw_curve(0.64, dmin=0.18, speed=0.15, latitude=2.7),
            grain=GrainModel(rms=8.0, floor=0.24),
            mtf_model=MTFModel(f50=42.0, adj=0.33),
            comment="High-speed street BW: punchy contrast, crisp grain.",
        )
    )

    s.append(
        FilmStock(
            name="Agfa APX 100",
            manufacturer="Agfa",
            year=1989,
            iso=100,
            resolution=150,
            density_measure="bw",
            curve=_bw_curve(0.64, dmin=0.10, latitude=3.3),
            grain=GrainModel(rms=3.0, floor=0.18),
            mtf_model=MTFModel(f50=80.0, adj=0.30),
            comment="Classic European cubic-grain BW with long tonality.",
        )
    )
    s.append(
        FilmStock(
            name="Kentmere Pan 400",
            manufacturer="Kentmere",
            year=2009,
            iso=400,
            resolution=95,
            density_measure="bw",
            curve=_bw_curve(0.61, dmin=0.14, latitude=3.2),
            grain=GrainModel(rms=6.0, floor=0.22),
            mtf_model=MTFModel(f50=48.0, adj=0.32),
            comment="Budget fast BW, HP5-adjacent with softer edge response.",
        )
    )
    s.append(
        FilmStock(
            name="Ilford Pan F Plus 50",
            manufacturer="Ilford",
            year=1992,
            iso=50,
            resolution=200,
            density_measure="bw",
            # Datasheet: very fine grain, high acutance, notably SHORT
            # exposure latitude for a BW negative.
            curve=_bw_curve(0.70, dmin=0.08, latitude=2.7),
            grain=GrainModel(rms=1.7, floor=0.14),
            mtf_model=MTFModel(f50=110.0, adj=0.34),
            comment="Slowest Ilford BW: finest grain, short latitude.",
        )
    )
    s.append(
        FilmStock(
            name="Ilford XP2 Super 400",
            manufacturer="Ilford",
            year=1998,
            iso=400,
            resolution=110,
            density_measure="bw",
            # Chromogenic C-41 BW: dye clouds instead of silver — smoother
            # grain than silver 400s and famously wide latitude (EI 50-800
            # on one development).
            curve=_bw_curve(0.60, dmin=0.10, latitude=4.0),
            grain=GrainModel(rms=3.4, floor=0.12),
            mtf_model=MTFModel(f50=55.0, adj=0.28),
            comment="Chromogenic BW: dye-cloud grain, huge latitude.",
        )
    )

    # ----------------------------------------------------- reversal (slide)
    s.append(
        FilmStock(
            name="Kodak Ektachrome E100",
            manufacturer="Kodak",
            year=2018,
            iso=100,
            film_type="positive",
            resolution=125,
            curve=_slide_curve(-1.65, dmax=3.6, dmin=0.15, latitude=2.2),
            dyes=DyeSet(unwanted=(0.07, 0.12, 0.03)),
            grain=GrainModel(rms=2.8),
            mtf_model=MTFModel(f50=65.0, adj=0.28),
        )
    )
    s.append(
        FilmStock(
            name="Fuji Velvia 50",
            manufacturer="Fujifilm",
            year=1990,
            iso=50,
            film_type="positive",
            resolution=160,
            curve=_slide_curve(-1.95, dmax=3.8, dmin=0.12, latitude=1.9),
            sens=Sensitivities(peaks=(646.0, 545.0, 460.0), widths=(32.0, 32.0, 29.0)),
            dyes=DyeSet(unwanted=(0.06, 0.10, 0.02)),
            grain=GrainModel(rms=2.6),
            mtf_model=MTFModel(f50=80.0, adj=0.30),
            comment="Ultra-saturated landscape slide.",
        )
    )
    s.append(
        FilmStock(
            name="Fuji Velvia 100",
            manufacturer="Fujifilm",
            year=2005,
            iso=100,
            film_type="positive",
            resolution=160,
            # One stop faster Velvia: contrast and saturation sit between
            # Velvia 50 and Provia 100F (Fuji E-6 datasheet family).
            curve=_slide_curve(-1.88, dmax=3.7, dmin=0.12, latitude=1.95),
            sens=Sensitivities(peaks=(646.0, 545.0, 460.0), widths=(33.0, 33.0, 30.0)),
            dyes=DyeSet(unwanted=(0.07, 0.11, 0.03)),
            grain=GrainModel(rms=2.8),
            mtf_model=MTFModel(f50=80.0, adj=0.30),
            comment="Velvia speed update: vivid, a touch tamer than 50.",
        )
    )
    s.append(
        FilmStock(
            name="Agfa CT Precisa 100",
            manufacturer="Agfa",
            year=2001,
            iso=100,
            film_type="positive",
            resolution=135,
            curve=_slide_curve(-1.75, dmax=3.4, dmin=0.13, latitude=2.0),
            sens=Sensitivities(peaks=(650.0, 542.0, 452.0), widths=(36.0, 35.0, 32.0)),
            dyes=DyeSet(unwanted=(0.08, 0.12, 0.04)),
            grain=GrainModel(rms=3.2),
            mtf_model=MTFModel(f50=64.0, adj=0.28),
            comment="Cool-leaning consumer E-6 (the cross-process favorite).",
        )
    )
    s.append(
        FilmStock(
            name="Fuji Provia 100F",
            manufacturer="Fujifilm",
            year=2001,
            iso=100,
            film_type="positive",
            resolution=140,
            curve=_slide_curve(-1.7, dmax=3.6, dmin=0.13, latitude=2.1),
            grain=GrainModel(rms=2.3),
            mtf_model=MTFModel(f50=70.0, adj=0.28),
        )
    )
    s.append(
        FilmStock(
            name="Fuji Astia 100F",
            manufacturer="Fujifilm",
            year=2003,
            iso=100,
            film_type="positive",
            resolution=140,
            curve=_slide_curve(-1.5, dmax=3.4, dmin=0.12, latitude=2.35),
            dyes=DyeSet(unwanted=(0.04, 0.07, 0.02)),
            grain=GrainModel(rms=2.2),
            mtf_model=MTFModel(f50=68.0, adj=0.24),
            comment="The soft portrait slide: lowest-contrast E-6, gentle skin.",
        )
    )

    s.append(
        FilmStock(
            name="Kodak Kodachrome 64",
            manufacturer="Kodak",
            year=1974,
            iso=64,
            film_type="positive",
            resolution=100,
            curve=_slide_curve(-1.85, dmax=3.7, dmin=0.15, latitude=2.0),
            sens=Sensitivities(peaks=(650.0, 545.0, 458.0), widths=(30.0, 31.0, 28.0)),
            dyes=DyeSet(unwanted=(0.05, 0.08, 0.02)),
            grain=GrainModel(rms=3.2),
            mtf_model=MTFModel(f50=63.0, adj=0.34),
            comment="The archival slide: deep reds, punchy micro-contrast.",
        )
    )

    # ----------------------------------------------------- print media
    s.append(
        FilmStock(
            name="Fuji Crystal Archive Maxima",
            manufacturer="Fujifilm",
            year=2014,
            stage="print",
            film_type="paper",
            medium="paper",
            iso=0,
            resolution=120,
            curve=_paper_curve(2.9, dmin=0.06, dmax=2.45),
            sens=Sensitivities(peaks=(695.0, 552.0, 472.0), widths=(30.0, 32.0, 30.0)),
            dyes=DyeSet(peaks=(650.0, 542.0, 442.0), unwanted=(0.06, 0.10, 0.02)),
            grain=None,
            mtf_model=None,
            comment="High-gloss silver-halide display paper.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak Endura Premier",
            manufacturer="Kodak",
            year=2012,
            stage="print",
            film_type="paper",
            medium="paper",
            iso=0,
            resolution=110,
            curve=_paper_curve(2.7, dmin=0.07, dmax=2.30),
            sens=Sensitivities(peaks=(700.0, 550.0, 470.0), widths=(32.0, 33.0, 31.0)),
            dyes=DyeSet(peaks=(652.0, 545.0, 444.0), unwanted=(0.07, 0.11, 0.03)),
            grain=None,
            mtf_model=None,
        )
    )
    s.append(
        FilmStock(
            name="Kodak Vision Premier 2393",
            manufacturer="Kodak",
            year=2002,
            stage="print",
            film_type="positive",
            iso=0,
            resolution=150,
            curve=_paper_curve(3.1, dmin=0.05, dmax=3.9),
            sens=Sensitivities(peaks=(690.0, 548.0, 465.0), widths=(28.0, 30.0, 28.0)),
            dyes=DyeSet(peaks=(655.0, 544.0, 443.0), unwanted=(0.05, 0.09, 0.02)),
            grain=None,
            mtf_model=None,
            comment="Premium motion-picture print stock (projection contrast).",
        )
    )
    s.append(
        FilmStock(
            name="Ilford Multigrade IV RC",
            manufacturer="Ilford",
            year=1995,
            stage="print",
            film_type="paper",
            medium="paper",
            iso=0,
            resolution=100,
            density_measure="bw",
            curve=_bw_paper_curve(2.0, dmin=0.06, dmax=2.15),
            grain=None,
            mtf_model=None,
            comment="Silver-gelatin BW enlarging paper (grade 2 contrast).",
        )
    )
    s.append(
        FilmStock(
            name="Ilford Multigrade IV RC grade 4",
            manufacturer="Ilford",
            year=1995,
            stage="print",
            film_type="paper",
            medium="paper",
            iso=0,
            resolution=100,
            density_measure="bw",
            alias=("Multigrade hard",),
            curve=_bw_paper_curve(3.1, dmin=0.06, dmax=2.2),
            grain=None,
            mtf_model=None,
            comment="Hard-grade BW paper for flat negatives.",
        )
    )
    s.append(
        FilmStock(
            name="Kodak 2383",
            manufacturer="Kodak",
            year=1998,
            stage="print",
            film_type="positive",
            iso=0,
            resolution=150,
            curve=_paper_curve(3.0, dmin=0.06, dmax=3.7),
            sens=Sensitivities(peaks=(690.0, 548.0, 465.0), widths=(29.0, 31.0, 29.0)),
            dyes=DyeSet(peaks=(655.0, 544.0, 443.0), unwanted=(0.06, 0.10, 0.03)),
            grain=None,
            mtf_model=None,
            comment="The standard cine print emulation target.",
        )
    )
    return s


@lru_cache(maxsize=1)
def load_film_stocks() -> dict[str, FilmStock]:
    """Name -> FilmStock database (the reference's film_loader equivalent)."""
    return {stock.name: stock for stock in _stocks()}


def camera_stocks() -> dict[str, FilmStock]:
    return {k: v for k, v in load_film_stocks().items() if v.stage == "camera"}


def print_stocks() -> dict[str, FilmStock]:
    return {k: v for k, v in load_film_stocks().items() if v.stage == "print"}
