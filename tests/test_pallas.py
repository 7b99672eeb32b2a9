"""Pallas echo kernel: interpret-mode equality with the jnp backend."""

import dataclasses

import numpy as np
import pytest

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts, phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.utils import cplx


def small_opts(**kw):
    base = dict(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6, pulse_width_s=2e-6,
                fs_hz=60e6, num_samples=384)
    base.update(kw)
    return EchoOpts(**base)


class TestPallasEchoBackend:
    @pytest.mark.parametrize("variant", ["plain", "spotlight"])
    def test_matches_jnp_backend(self, variant):
        g = cfg.satellite_stripmap().geometry
        traj = orbit.make_trajectory(g, orbit.slow_time_grid(24 / 6000.0, 24))
        tgts = T.destroyer()
        kw = {}
        if variant == "spotlight":
            kw = dict(endpoint_grid=False, chirp_centering="centered",
                      amplitude="rcs", stop_and_go=True,
                      antenna_length_m=30.0)
        o_jnp = small_opts(backend="jnp", **kw)
        o_pl = small_opts(backend="pallas_interpret", **kw)
        t0 = window_start_time(g.slant_range_m, o_jnp, 384 / 60e6,
                               "reference" if variant == "plain" else "centered")
        vel = (5.0, 2.0, 0.0)
        a = cplx.to_host(phase_history(traj, tgts, o_jnp, t_start=t0,
                                       target_velocity=vel))
        b = cplx.to_host(phase_history(traj, tgts, o_pl, t_start=t0,
                                       target_velocity=vel))
        assert np.abs(a - b).max() / np.abs(a).max() < 2e-4

    def test_chunked_geometry(self):
        """Pallas path with tiny target chunks still matches."""
        g = cfg.satellite_stripmap().geometry
        traj = orbit.make_trajectory(g, orbit.slow_time_grid(8 / 6000.0, 8))
        tgts = T.destroyer()
        o_a = small_opts(backend="pallas_interpret", target_chunk=7)
        o_b = small_opts(backend="jnp")
        t0 = window_start_time(g.slant_range_m, o_a, 384 / 60e6, "reference")
        a = cplx.to_host(phase_history(traj, tgts, o_a, t_start=t0))
        b = cplx.to_host(phase_history(traj, tgts, o_b, t_start=t0))
        assert np.abs(a - b).max() / np.abs(b).max() < 2e-4
