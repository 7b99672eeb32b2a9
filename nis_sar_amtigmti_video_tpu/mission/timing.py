"""PRF / swath timing analysis: transmit eclipsing and nadir returns.

Quantitative equivalent of the ``range swath problems.html`` demo
(:161-481): a SAR cannot receive while transmitting, so the echo window
[2*R_near/c, 2*R_far/c] must avoid every transmit event n/PRF (+pulse width).
A wide beam (long echo) collides at high PRF ("ECLIPSE/AMBIGUITY" in the
demo); the classic timing (zebra) diagram maps which (PRF, swath) pairs are
clean. Also checks the nadir return 2*h/c + multiples.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

C = 299792458.0


@dataclass(frozen=True)
class SwathWindow:
    r_near_m: float
    r_far_m: float

    @property
    def t_open(self) -> float:
        return 2.0 * self.r_near_m / C

    @property
    def t_close(self) -> float:
        return 2.0 * self.r_far_m / C


class TimingReport(NamedTuple):
    rank: int                 # number of pulses in flight when the echo returns
    tx_eclipsed: bool         # echo overlaps a transmit event
    nadir_eclipsed: bool      # echo overlaps a nadir return
    echo_fraction_clear: float
    duty_cycle: float


def timing_report(prf_hz: float, swath: SwathWindow, pulse_width_s: float,
                  altitude_m: float | None = None,
                  guard_s: float = 0.0) -> TimingReport:
    """Check one (PRF, swath) operating point."""
    pri = 1.0 / prf_hz
    t0, t1 = swath.t_open, swath.t_close + pulse_width_s
    rank = int(t0 // pri)

    # transmit events cover [n*pri, n*pri + Tp] (+guard) — fold echo into PRI
    def overlap(a0, a1, b0, b1):
        return max(0.0, min(a1, b1) - max(a0, b0))

    blocked = 0.0
    n0 = int(t0 // pri) - 1
    n1 = int(t1 // pri) + 1
    for n in range(n0, n1 + 1):
        blocked += overlap(t0, t1, n * pri - guard_s,
                           n * pri + pulse_width_s + guard_s)
    tx_ecl = blocked > 0.0

    nadir_ecl = False
    if altitude_m is not None:
        t_nadir = 2.0 * altitude_m / C
        for m in range(n0, n1 + 1):
            n_t = t_nadir + m * pri
            if overlap(t0, t1, n_t, n_t + 2.0 * pulse_width_s) > 0.0:
                nadir_ecl = True
                break

    dur = t1 - t0
    return TimingReport(rank=rank, tx_eclipsed=tx_ecl, nadir_eclipsed=nadir_ecl,
                        echo_fraction_clear=1.0 - min(1.0, blocked / dur),
                        duty_cycle=pulse_width_s * prf_hz)


def valid_prfs(swath: SwathWindow, pulse_width_s: float,
               prf_min: float, prf_max: float, n_grid: int = 2000,
               altitude_m: float | None = None, guard_s: float = 0.0):
    """Scan a PRF band; returns (prfs, clear_mask) — the 1-D cut of the
    timing/zebra diagram for this swath."""
    prfs = np.linspace(prf_min, prf_max, n_grid)
    clear = np.zeros(n_grid, bool)
    for i, prf in enumerate(prfs):
        r = timing_report(prf, swath, pulse_width_s, altitude_m, guard_s)
        clear[i] = not (r.tx_eclipsed or r.nadir_eclipsed)
    return prfs, clear


def max_unambiguous_swath(prf_hz: float, pulse_width_s: float) -> float:
    """Largest slant-range swath depth receivable between two transmits."""
    return C * (1.0 / prf_hz - 2.0 * pulse_width_s) / 2.0


def swath_from_geometry(geom, beamwidth_deg: float) -> SwathWindow:
    """Slant near/far ranges of an elevation beam centered on the look angle
    (spherical-earth solve, matching config.GeometryConfig)."""
    import dataclasses
    half = beamwidth_deg / 2.0
    near = dataclasses.replace(geom, look_angle_deg=geom.look_angle_deg - half)
    far = dataclasses.replace(geom, look_angle_deg=geom.look_angle_deg + half)
    return SwathWindow(near.slant_range_m, far.slant_range_m)
