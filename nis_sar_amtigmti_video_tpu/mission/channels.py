"""Frequency-division channelization for multistatic constellation operation.

Quantitative port of the two spectrum demos:
* ``Freq Division 1.html:124-322`` — C-band (4.0-4.8 GHz) / X-band
  (9.6-10.4 GHz) spectral coexistence.
* ``Freq Division 2.html:138-341`` — the constellation plan: 5 X-band chirps
  of 250 MHz at centers 9.2-10.8 GHz with 150 MHz guards, so five
  transmitters can illuminate simultaneously without interference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple


@dataclass(frozen=True)
class ChannelPlan:
    """A set of (center_hz, bandwidth_hz) chirp channels."""

    channels: Tuple[Tuple[float, float], ...]

    def edges(self) -> List[Tuple[float, float]]:
        return [(c - b / 2.0, c + b / 2.0) for c, b in self.channels]

    def guard_bands(self) -> List[float]:
        """Gaps between adjacent channels (sorted by frequency)."""
        e = sorted(self.edges())
        return [e[i + 1][0] - e[i][1] for i in range(len(e) - 1)]

    def min_guard(self) -> float:
        g = self.guard_bands()
        return min(g) if g else float("inf")

    def overlaps(self) -> bool:
        return self.min_guard() < 0.0

    def validate(self, min_guard_hz: float = 0.0) -> None:
        if self.overlaps():
            raise ValueError("channel plan has overlapping chirps")
        if self.min_guard() < min_guard_hz:
            raise ValueError(
                f"guard band {self.min_guard()/1e6:.1f} MHz below required "
                f"{min_guard_hz/1e6:.1f} MHz")

    def assign(self, num_platforms: int) -> List[int]:
        """Round-robin channel index per platform (multistatic operation)."""
        n = len(self.channels)
        return [i % n for i in range(num_platforms)]

    def occupied(self, freq_hz: float) -> bool:
        return any(lo <= freq_hz <= hi for lo, hi in self.edges())


def xband_5channel() -> ChannelPlan:
    """The reference's constellation plan: 5 x 250 MHz, centers 9.2-10.8 GHz,
    150 MHz guards (Freq Division 2.html:145-155)."""
    centers = [9.2e9, 9.6e9, 10.0e9, 10.4e9, 10.8e9]
    return ChannelPlan(tuple((c, 250e6) for c in centers))


def c_x_coexistence() -> ChannelPlan:
    """C-band + X-band coexistence (Freq Division 1.html:124-135)."""
    return ChannelPlan(((4.4e9, 800e6), (10.0e9, 800e6)))


def uniform_plan(f_lo_hz: float, f_hi_hz: float, num_channels: int,
                 bandwidth_hz: float) -> ChannelPlan:
    """Evenly spaced centers across [f_lo, f_hi]."""
    if num_channels == 1:
        centers = [(f_lo_hz + f_hi_hz) / 2.0]
    else:
        step = (f_hi_hz - f_lo_hz) / (num_channels - 1)
        centers = [f_lo_hz + i * step for i in range(num_channels)]
    return ChannelPlan(tuple((c, bandwidth_hz) for c in centers))
