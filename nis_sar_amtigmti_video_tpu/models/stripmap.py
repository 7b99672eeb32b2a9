"""Single-channel stripmap pipeline (spaceborne or airborne).

End-to-end slice of the reference's ``sar_satellite_sim.py`` /
``sar_satellite_moving_sim.py`` / ``sar_vehicle_sim.py`` call stacks
(SURVEY.md §3.1): geometry -> targets -> echo -> radar-equation noise ->
RDA or CSA focusing -> products. Everything after the host-side trajectory
build runs on device; fetch with utils.cplx.to_host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu.config import ScenarioConfig
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops import noise as noise_ops
from nis_sar_amtigmti_video_tpu.ops import rda as rda_ops
from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts, phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene.targets import PointTargets


class StripmapProducts(NamedTuple):
    raw: jax.Array                 # (P, Ns) complex64 phase history (w/ noise)
    image: jax.Array               # focused SLC, (azimuth, range)
    intermediates: Optional[rda_ops.RdaProducts]   # RDA chain (None for CSA)
    range_axis: np.ndarray
    cross_range: np.ndarray
    doppler_axis: Optional[np.ndarray]
    snr_db: float


def echo_opts_for(sc: ScenarioConfig) -> EchoOpts:
    r, c = sc.radar, sc.collect
    return EchoOpts(
        fc_hz=r.fc_hz, chirp_rate=r.chirp_rate, pulse_width_s=r.pulse_width_s,
        fs_hz=r.fs_hz, num_samples=c.num_samples(r.fs_hz),
        endpoint_grid=(c.window_start_mode == "reference"),
        chirp_centering="leading", amplitude="sqrt_rcs",
        backend=c.echo_backend, freq_oversample=c.echo_oversample)


def simulate_raw(sc: ScenarioConfig, targets: PointTargets, *,
                 target_velocity=(0.0, 0.0, 0.0), key=None,
                 avg_rcs: float | None = None):
    """Trajectory + echo + (optional) noise. Returns (raw, traj, t_start, snr)."""
    r, g, c = sc.radar, sc.geometry, sc.collect
    n_p = c.num_pulses(r.prf_hz)
    traj = orbit.make_trajectory(g, orbit.slow_time_grid(c.integration_time_s, n_p))
    opts = echo_opts_for(sc)
    t0 = window_start_time(g.slant_range_m, opts, c.window_length_s,
                           c.window_start_mode)
    raw = phase_history(traj, targets, opts, t_start=t0,
                        target_velocity=target_velocity)
    rcs = avg_rcs if avg_rcs is not None else targets.total_rcs
    snr, _ = noise_ops.snr_db(sc.noise, g.slant_range_m, rcs,
                              r.wavelength_m, r.bandwidth_hz,
                              c.integration_time_s)
    if key is not None:
        raw = noise_ops.add_ocean_noise(key, raw, snr, sc.noise.scr_db,
                                        sc.noise.k_shape)
    return raw, traj, t0, snr


def run(sc: ScenarioConfig, targets: PointTargets, *,
        target_velocity=(0.0, 0.0, 0.0), key=None,
        avg_rcs: float | None = None) -> StripmapProducts:
    """Full single-channel collect + focus according to the scenario config."""
    r, g = sc.radar, sc.geometry
    raw, traj, t0, snr = simulate_raw(sc, targets,
                                      target_velocity=target_velocity,
                                      key=key, avg_rcs=avg_rcs)
    n_p, n_s = raw.shape
    if sc.processing.algorithm == "csa":
        p = csa_ops.CsaParams(
            wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate,
            fs_hz=r.fs_hz, prf_hz=r.prf_hz,
            velocity_mps=g.effective_velocity_mps, range_ref_m=g.slant_range_m,
            t_start_fast=t0, num_pulses=n_p, num_samples=n_s)
        image = csa_ops.focus_csa(raw, p)
        rax, cax = csa_ops.csa_axes(p)
        return StripmapProducts(raw=raw, image=image, intermediates=None,
                                range_axis=rax, cross_range=cax,
                                doppler_axis=None, snr_db=snr)
    if sc.processing.algorithm == "rda":
        p = rda_ops.RdaParams(
            wavelength_m=r.wavelength_m, pulse_width_s=r.pulse_width_s,
            chirp_rate=r.chirp_rate, fs_hz=r.fs_hz, prf_hz=r.prf_hz,
            velocity_mps=g.effective_velocity_mps, range_ref_m=g.slant_range_m,
            num_pulses=n_p, num_samples=n_s,
            range_window=sc.processing.range_window,
            azimuth_window=sc.processing.azimuth_window,
            rcmc_mode=sc.processing.rcmc_mode)
        prod = rda_ops.focus_rda(raw, p)
        _, r_centered, cax, fd = rda_ops.rda_axes(p)
        return StripmapProducts(raw=raw, image=prod.image, intermediates=prod,
                                range_axis=r_centered, cross_range=cax,
                                doppler_axis=fd, snr_db=snr)
    raise ValueError(f"unknown algorithm {sc.processing.algorithm!r} for stripmap")
