"""Image-quality and GMTI metrics: the framework's structured observability.

The reference validates visually and via ad-hoc prints (SURVEY.md §4); these
are the quantitative equivalents: impulse-response metrics (resolution, PSLR,
ISLR), DPCA cancellation in dB, and a radar-budget report mirroring the
reference's printed parameter dumps (sar_satellite_sim.py:61-70, 343).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ImpulseResponse:
    resolution_cells: float    # -3 dB width in cells
    resolution_m: Optional[float]
    pslr_db: float             # peak sidelobe ratio (negative)
    islr_db: float             # integrated sidelobe ratio
    peak_index: int
    peak_value: float


def _interp_width(mag: np.ndarray, peak: int, level: float) -> float:
    """Width of the main lobe at ``level`` (fractional cells, linear interp)."""
    n = mag.shape[0]

    def cross(i0, i1):
        a, b = mag[i0], mag[i1]
        if a == b:
            return float(i0)
        return i0 + (level - a) / (b - a) * (i1 - i0)

    # walk outward from the peak to the first crossing on each side
    lo = peak
    while lo > 0 and mag[lo] >= level:
        lo -= 1
    hi = peak
    while hi < n - 1 and mag[hi] >= level:
        hi += 1
    x_lo = cross(lo, lo + 1) if mag[lo] < level else float(lo)
    x_hi = cross(hi, hi - 1) if mag[hi] < level else float(hi)
    return abs(x_hi - x_lo)


def impulse_response(profile: np.ndarray,
                     cell_size_m: float | None = None) -> ImpulseResponse:
    """1-D IRF analysis of a focused point-target cut (range or azimuth)."""
    mag = np.abs(np.asarray(profile)).astype(np.float64)
    peak = int(mag.argmax())
    pk = mag[peak]
    level = pk / math.sqrt(2.0)   # -3 dB
    width = _interp_width(mag, peak, level)

    # walk outward from the peak to the first local minimum on each side;
    # a peak at an array edge makes that edge its own null
    def first_null(direction):
        i = peak
        while 0 <= i + direction <= mag.shape[0] - 1:
            j = i + direction
            if mag[j] > mag[i]:
                return i
            i = j
        return i

    n_l, n_r = first_null(-1), first_null(+1)
    main = mag[n_l:n_r + 1]
    side = np.concatenate([mag[:n_l], mag[n_r + 1:]])
    pslr = 20.0 * math.log10((side.max() + 1e-300) / pk) if side.size else -300.0
    e_main = float(np.sum(main ** 2))
    e_side = float(np.sum(side ** 2))
    islr = 10.0 * math.log10((e_side + 1e-300) / (e_main + 1e-300))
    return ImpulseResponse(
        resolution_cells=width,
        resolution_m=width * cell_size_m if cell_size_m else None,
        pslr_db=pslr, islr_db=islr, peak_index=peak, peak_value=float(pk))


def expected_range_resolution(bandwidth_hz: float,
                              window_broadening: float = 1.0) -> float:
    """c/(2B), times the taper broadening factor (1.3 for Hamming)."""
    return window_broadening * 299792458.0 / (2.0 * bandwidth_hz)


def expected_azimuth_resolution(wavelength_m: float, slant_range_m: float,
                                aperture_m: float) -> float:
    """lambda*R/(2*L_sa) for an unweighted synthetic aperture."""
    return wavelength_m * slant_range_m / (2.0 * aperture_m)


def cancellation_db(slc1_mag_mean: float, dpca_mag_mean: float) -> float:
    """DPCA clutter-cancellation in dB (sar_ati_dcpa_viewer_csa.py:139-143)."""
    return 20.0 * math.log10(slc1_mag_mean / (dpca_mag_mean + 1e-300))


def radar_budget_report(sc) -> dict:
    """Structured version of the reference's printed parameter dump."""
    g, r, n = sc.geometry, sc.radar, sc.noise
    from nis_sar_amtigmti_video_tpu.ops.noise import snr_db
    s, gain = snr_db(n, g.slant_range_m, 1.0, r.wavelength_m, r.bandwidth_hz,
                     sc.collect.integration_time_s)
    return {
        "scenario": sc.name,
        "orbit_altitude_km": g.altitude_m / 1e3,
        "orbital_velocity_mps": g.speed_mps,
        "effective_velocity_mps": g.effective_velocity_mps,
        "look_angle_deg": g.look_angle_deg,
        "incidence_angle_deg": math.degrees(g.incidence_angle_rad),
        "slant_range_km": g.slant_range_m / 1e3,
        "center_freq_ghz": r.fc_hz / 1e9,
        "bandwidth_mhz": r.bandwidth_hz / 1e6,
        "prf_hz": r.prf_hz,
        "antenna_gain_db": gain,
        "snr_db_per_m2": s,
        "range_resolution_m": expected_range_resolution(r.bandwidth_hz),
    }
