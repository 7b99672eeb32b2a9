"""Scene/target factories and orbital geometry invariants."""

import numpy as np
import pytest

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field


class TestTargets:
    def test_counts_and_rcs(self):
        # point counts / RCS budgets of the reference models (vehicle_targets.py)
        assert T.car().num == 12 and T.car().total_rcs == pytest.approx(12.0)
        assert T.tank().num == 18 and T.tank().total_rcs == pytest.approx(90.0)
        assert T.fighter_jet().num == 13
        assert T.fighter_jet().total_rcs == pytest.approx(130.0)
        assert T.f35().total_rcs == pytest.approx(1.3)
        d = T.destroyer()
        assert d.num == 35
        # 30 hull/deck @1000 + bridge 5000 + mast/stack 3000x2 + bow/stern 1000x2
        assert d.total_rcs == pytest.approx(30 * 1000 + 5000 + 6000 + 2000)

    def test_destroyer_extent(self):
        d = T.destroyer()
        x = d.positions[:, 0]
        assert x.max() == pytest.approx(154.0 / 2 + 10.0)   # bow overhang
        assert x.min() == pytest.approx(-154.0 / 2 - 5.0)   # stern overhang
        assert d.positions[:, 2].max() == pytest.approx(25.0)  # mast

    def test_rotate_z(self):
        d = T.destroyer()
        r = d.rotate_z(90.0)
        # +X becomes +Y under a 90deg CCW rotation
        np.testing.assert_allclose(r.positions[:, 1], d.positions[:, 0], atol=1e-9)
        np.testing.assert_allclose(r.positions[:, 0], -d.positions[:, 1], atol=1e-9)
        np.testing.assert_allclose(r.positions[:, 2], d.positions[:, 2])

    def test_translate_concat(self):
        a = T.car((10.0, 0.0, 0.0))
        b = T.tank((0.0, 5.0, 0.0))
        both = T.PointTargets.concatenate([a, b])
        assert both.num == 30
        assert both.positions[:12, 0].mean() == pytest.approx(
            a.positions[:, 0].mean())


class TestClutter:
    def test_mean_rcs(self, rng):
        f = ocean_clutter_field(rng, num_points=20000, half_width_m=3000.0,
                                sigma0_db=5.0)
        area = 6000.0 ** 2
        expect = area * 10 ** 0.5 / 20000
        assert f.rcs.mean() == pytest.approx(expect, rel=0.05)
        assert np.abs(f.positions[:, :2]).max() <= 3000.0
        assert np.all(f.positions[:, 2] == 0.0)


class TestGeometry:
    def test_look_geometry(self):
        g = cfg.satellite_stripmap().geometry
        # values the reference logs for 350 km / 45 deg look
        assert g.orbital_velocity_mps == pytest.approx(
            np.sqrt(3.986004418e14 / 6721000.0))
        assert g.incidence_angle_rad == pytest.approx(
            np.arcsin((6721000.0 / 6371000.0) * np.sin(np.radians(45.0))))
        assert g.effective_velocity_mps == pytest.approx(
            g.orbital_velocity_mps * np.sqrt(6371000.0 / 6721000.0))
        # law-of-cosines slant range
        re, rs = 6371000.0, 6721000.0
        gam = g.earth_angle_rad
        assert g.slant_range_m == pytest.approx(
            np.sqrt(re**2 + rs**2 - 2 * re * rs * np.cos(gam)))

    @pytest.mark.parametrize("axis", ["x", "y"])
    def test_orbit_invariants(self, axis):
        g = cfg.GeometryConfig(platform="orbit", altitude_m=350e3,
                               look_angle_deg=45.0, along_track_axis=axis)
        times = orbit.slow_time_grid(1.2, 601)
        tr = orbit.orbit_trajectory(g, times)
        center = np.array([0.0, 0.0, -g.earth_radius_m])
        r = np.linalg.norm(tr.positions - center, axis=1)
        # |P - C| = R_sat everywhere
        np.testing.assert_allclose(r, g.orbit_radius_m, rtol=1e-12)
        # P . V = 0 (circular orbit)
        dots = np.sum((tr.positions - center) * tr.velocities, axis=1)
        np.testing.assert_allclose(dots / g.orbit_radius_m**2, 0.0, atol=1e-9)
        # speed constant
        np.testing.assert_allclose(np.linalg.norm(tr.velocities, axis=1),
                                   g.orbital_velocity_mps, rtol=1e-12)
        # broadside at t=0: slant range to origin equals config slant range
        mid = tr.positions[300]
        assert np.linalg.norm(mid) == pytest.approx(g.slant_range_m, rel=1e-9)

    def test_linear_track(self):
        g = cfg.airborne_vehicle().geometry
        times = orbit.slow_time_grid(2.0, 101)
        tr = orbit.linear_trajectory(g, times)
        assert tr.positions[50, 1] == pytest.approx(0.0, abs=1e-9)
        assert np.linalg.norm(tr.positions[50]) == pytest.approx(
            g.slant_range_m)
        np.testing.assert_allclose(tr.velocities[:, 1], 150.0)

    def test_velocity_consistency(self):
        """Finite-difference of positions matches analytic velocities."""
        g = cfg.satellite_stripmap().geometry
        times = orbit.slow_time_grid(1.0, 1001)
        tr = orbit.orbit_trajectory(g, times)
        dt = times[1] - times[0]
        fd = (tr.positions[2:] - tr.positions[:-2]) / (2 * dt)
        np.testing.assert_allclose(fd, tr.velocities[1:-1], rtol=1e-6, atol=1e-3)


class TestConfig:
    def test_presets_exist(self):
        for preset in [cfg.satellite_stripmap, cfg.satellite_moving,
                       cfg.ati_dpca, cfg.airborne_vehicle, cfg.videosar]:
            sc = preset()
            assert sc.radar.fc_hz > 1e9
            assert sc.geometry.slant_range_m > 0

    def test_dpca_baseline(self):
        sc = cfg.ati_dpca()
        v = sc.geometry.orbital_velocity_mps
        assert sc.channels.baseline_m == pytest.approx(2 * v / 6000.0)
        assert sc.channels.rx_offsets() == (
            pytest.approx(-v / 6000.0), pytest.approx(v / 6000.0))

    def test_videosar_schedule(self):
        sc = cfg.videosar()
        v = sc.video
        assert v.num_frames() == 50
        assert v.step_pulses(5000.0) == 500
        assert v.cpi_pulses(5000.0) == 2500
        assert v.total_pulses(5000.0) == 25000
