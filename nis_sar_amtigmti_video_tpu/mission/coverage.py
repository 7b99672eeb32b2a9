"""Constellation coverage / revisit analysis.

Quantitative port of the three.js mission designers' math (SURVEY.md §2.9):

* ``VideoSAR constellation.html:293-456`` — N satellites at 58 deg
  inclination, golden-angle RAAN spread, evenly spread mean anomaly; a target
  access is valid when the satellite is above the horizon, the off-nadir look
  angle is inside [min, max], and the squint (deviation from broadside) is
  inside +/-max_squint. Metrics: mean revisit gap, access windows, coverage %.
* ``distributed spotlight mode.html:259-444`` — same check, any-of-N
  coverage, designed for up to 9,000 satellites (here: one vmapped
  (time x sat) kernel, so 9,000 sats x 10,000 steps is a single device call).
* ``HRWS constellation.html:459-557`` — along-track-swath access: the target
  must fall inside a +/-125 km along-track window, the look-angle band, and
  the horizon.

The propagation is circular-orbit-with-rotating-earth, all float64, jitted.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import constants as k

GOLDEN_ANGLE = math.pi * (3.0 - math.sqrt(5.0))


@dataclass(frozen=True)
class ConstellationConfig:
    num_sats: int = 12
    altitude_m: float = 500e3
    inclination_deg: float = 58.0
    min_look_deg: float = 20.0
    max_look_deg: float = 55.0
    max_squint_deg: float = 45.0          # VideoSAR/spotlight designers
    azimuth_halfswath_m: float = 125e3    # HRWS along-track half-extent
    earth_radius_m: float = k.RE_MEAN

    @property
    def orbit_radius_m(self) -> float:
        return self.earth_radius_m + self.altitude_m

    @property
    def orbital_velocity(self) -> float:
        return math.sqrt(k.GM_EARTH / self.orbit_radius_m)


class CoverageStats(NamedTuple):
    coverage_fraction: float      # % of time target is accessible
    mean_revisit_s: float         # mean gap between accesses
    max_revisit_s: float
    mean_access_s: float          # mean contiguous access-window length
    num_accesses: int
    active_counts: np.ndarray     # (T,) number of satellites valid per step


def constellation_elements(cfg: ConstellationConfig):
    """(mean_anomaly0, raan, inclination) arrays — even anomaly spread +
    golden-angle RAAN (VideoSAR constellation.html:296-313)."""
    n = cfg.num_sats
    anomaly = 2.0 * math.pi * np.arange(n) / n
    raan = (np.arange(n) * GOLDEN_ANGLE) % (2.0 * math.pi)
    incl = np.full(n, math.radians(cfg.inclination_deg))
    return anomaly, raan, incl


def _rot_x(v, a):
    c, s = jnp.cos(a), jnp.sin(a)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x, c * y - s * z, s * y + c * z], axis=-1)


def _rot_z(v, a):
    c, s = jnp.cos(a), jnp.sin(a)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)


def satellite_states(cfg: ConstellationConfig, t):
    """ECI positions/velocities of all sats at times t: (T, N, 3) each."""
    anomaly0, raan, incl = (jnp.asarray(a) for a in constellation_elements(cfg))
    r = cfg.orbit_radius_m
    om = cfg.orbital_velocity / r
    a = anomaly0[None, :] + om * jnp.asarray(t)[:, None]       # (T, N)
    base = jnp.stack([r * jnp.cos(a), r * jnp.sin(a),
                      jnp.zeros_like(a)], axis=-1)
    vel = jnp.stack([-r * om * jnp.sin(a), r * om * jnp.cos(a),
                     jnp.zeros_like(a)], axis=-1)
    pos = _rot_z(_rot_x(base, incl[None, :]), raan[None, :])
    vel = _rot_z(_rot_x(vel, incl[None, :]), raan[None, :])
    return pos, vel


def target_positions(cfg: ConstellationConfig, lat_deg, lon_deg, t):
    """ECI position of a rotating-earth surface target: (T, 3)."""
    lat, lon = math.radians(lat_deg), math.radians(lon_deg)
    re = cfg.earth_radius_m
    rot = 2.0 * math.pi / k.EARTH_DAY_S
    lon_t = lon + rot * jnp.asarray(t)
    return jnp.stack([re * math.cos(lat) * jnp.cos(lon_t),
                      re * math.cos(lat) * jnp.sin(lon_t),
                      jnp.full_like(lon_t, re * math.sin(lat))], axis=-1)


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("cfg", "mode", "lat_deg", "lon_deg"))
def access_matrix(cfg: ConstellationConfig, t, lat_deg: float, lon_deg: float,
                  mode: str = "spotlight"):
    """(T, N) bool validity of each satellite at each time.

    mode='spotlight': horizon + look-angle band + squint band (the VideoSAR /
    distributed-spotlight check). mode='hrws': horizon + look band +
    along-track swath window (the HRWS butterfly check).
    """
    sat_pos, sat_vel = satellite_states(cfg, t)             # (T, N, 3)
    tgt = target_positions(cfg, lat_deg, lon_deg, t)        # (T, 3)

    to_tgt = tgt[:, None, :] - sat_pos                       # (T, N, 3)
    dist = jnp.linalg.norm(to_tgt, axis=-1)
    horizon = math.sqrt(cfg.orbit_radius_m ** 2 - cfg.earth_radius_m ** 2)
    visible = dist < horizon

    nadir = -_unit(sat_pos)
    off_nadir = jnp.arccos(jnp.clip(
        jnp.sum(nadir * _unit(to_tgt), axis=-1), -1.0, 1.0))
    look_ok = ((off_nadir >= math.radians(cfg.min_look_deg))
               & (off_nadir <= math.radians(cfg.max_look_deg)))

    if mode == "spotlight":
        to_vel = jnp.arccos(jnp.clip(
            jnp.sum(_unit(sat_vel) * _unit(to_tgt), axis=-1), -1.0, 1.0))
        squint_ok = jnp.abs(to_vel - math.pi / 2.0) <= math.radians(
            cfg.max_squint_deg)
        return visible & look_ok & squint_ok
    if mode == "hrws":
        along = jnp.abs(jnp.sum(_unit(sat_vel) * to_tgt, axis=-1))
        return visible & look_ok & (along <= cfg.azimuth_halfswath_m)
    raise ValueError(mode)


def coverage_stats(valid: np.ndarray, dt_s: float) -> CoverageStats:
    """Revisit/access statistics from a (T, N) validity matrix.

    The run-length reduction runs in the native C++ tier when available
    (distributed-spotlight analyses are thousands of sats x 1e5+ steps)."""
    from nis_sar_amtigmti_video_tpu import native

    valid = np.asarray(valid)
    active = valid.sum(axis=1)
    covered = active > 0
    frac, mean_gap, max_gap, mean_acc, n_acc, _ = native.rle_stats(covered, dt_s)
    return CoverageStats(
        coverage_fraction=float(frac),
        mean_revisit_s=float(mean_gap),
        max_revisit_s=float(max_gap),
        mean_access_s=float(mean_acc),
        num_accesses=int(n_acc),
        active_counts=active)


def analyze(cfg: ConstellationConfig, duration_s: float = 6000.0,
            dt_s: float = 10.0, lat_deg: float = 35.0, lon_deg: float = 0.0,
            mode: str = "spotlight") -> CoverageStats:
    t = np.arange(0.0, duration_s, dt_s)
    valid = access_matrix(cfg, jnp.asarray(t), lat_deg, lon_deg, mode)
    return coverage_stats(np.asarray(valid), dt_s)
