"""Mission-design modules: constellation coverage, PRF timing, channel plans."""

import numpy as np
import pytest

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu.mission import channels, coverage, timing


class TestCoverage:
    def test_orbit_radius_preserved(self):
        cfg = coverage.ConstellationConfig(num_sats=6, altitude_m=500e3)
        t = np.arange(0.0, 3000.0, 60.0)
        pos, vel = coverage.satellite_states(cfg, t)
        r = np.linalg.norm(np.asarray(pos), axis=-1)
        np.testing.assert_allclose(r, cfg.orbit_radius_m, rtol=1e-9)
        # velocity magnitude and orthogonality
        v = np.linalg.norm(np.asarray(vel), axis=-1)
        np.testing.assert_allclose(v, cfg.orbital_velocity, rtol=1e-9)
        dots = np.sum(np.asarray(pos) * np.asarray(vel), axis=-1)
        np.testing.assert_allclose(dots / cfg.orbit_radius_m**2, 0.0,
                                   atol=1e-9)

    def test_more_sats_more_coverage(self):
        small = coverage.analyze(
            coverage.ConstellationConfig(num_sats=4, altitude_m=600e3),
            duration_s=9000.0, dt_s=30.0)
        big = coverage.analyze(
            coverage.ConstellationConfig(num_sats=60, altitude_m=600e3),
            duration_s=9000.0, dt_s=30.0)
        assert big.coverage_fraction > small.coverage_fraction
        assert 0.0 <= small.coverage_fraction <= 1.0

    def test_hrws_mode_wider_than_spotlight_squint0(self):
        """HRWS's 250 km along-track swath acceptance differs from the
        spotlight squint cone; both run and give sane fractions."""
        cfg = coverage.ConstellationConfig(num_sats=30, altitude_m=600e3)
        t = np.arange(0.0, 6000.0, 30.0)
        spot = np.asarray(coverage.access_matrix(cfg, t, 35.0, 0.0,
                                                 "spotlight"))
        hrws = np.asarray(coverage.access_matrix(cfg, t, 35.0, 0.0, "hrws"))
        assert spot.shape == hrws.shape == (t.size, 30)
        assert spot.any() and hrws.any()

    def test_many_sats_vectorized(self):
        """Distributed-spotlight scale (2,000 sats) in one device call."""
        cfg = coverage.ConstellationConfig(num_sats=2000, altitude_m=550e3)
        t = np.arange(0.0, 600.0, 30.0)
        valid = np.asarray(coverage.access_matrix(cfg, t, 20.0, 10.0))
        assert valid.shape == (20, 2000)
        stats = coverage.coverage_stats(valid, 30.0)
        assert stats.coverage_fraction > 0.5  # 2k sats ~ continuous coverage


class TestTiming:
    def test_rank_and_clear_point(self):
        # 600 km slant range, 10 us pulse, choose a PRF that leaves the echo
        # between transmit events
        sw = timing.SwathWindow(600e3, 615e3)
        rep = timing.timing_report(2000.0, sw, 10e-6)
        assert rep.rank == int(sw.t_open * 2000.0)
        assert 0.0 <= rep.echo_fraction_clear <= 1.0

    def test_eclipse_detected_at_bad_prf(self):
        """If the echo window contains n*PRI, transmit eclipses reception."""
        sw = timing.SwathWindow(599e3, 601e3)
        t_mid = (sw.t_open + sw.t_close) / 2
        # choose PRI so a transmit lands mid-echo: PRI = t_mid / k
        k = 9
        prf = k / t_mid
        rep = timing.timing_report(prf, sw, 20e-6)
        assert rep.tx_eclipsed

    def test_wide_swath_worse_than_narrow(self):
        """The demo's core point: wide beams collide at PRFs where narrow
        beams are clean."""
        wide = timing.SwathWindow(500e3, 560e3)
        narrow = timing.SwathWindow(525e3, 535e3)
        prfs, clear_w = timing.valid_prfs(wide, 20e-6, 1000.0, 8000.0, 500)
        _, clear_n = timing.valid_prfs(narrow, 20e-6, 1000.0, 8000.0, 500)
        assert clear_n.sum() > clear_w.sum()

    def test_max_unambiguous_swath(self):
        assert timing.max_unambiguous_swath(5000.0, 20e-6) == pytest.approx(
            299792458.0 * (200e-6 - 40e-6) / 2)

    def test_swath_from_geometry(self):
        from nis_sar_amtigmti_video_tpu import config as cfg
        sw = timing.swath_from_geometry(cfg.satellite_stripmap().geometry, 2.0)
        assert sw.r_far_m > sw.r_near_m > 0


class TestChannels:
    def test_xband_plan_guards(self):
        plan = channels.xband_5channel()
        assert len(plan.channels) == 5
        # 400 MHz spacing - 250 MHz bw = 150 MHz guards
        np.testing.assert_allclose(plan.guard_bands(), 150e6)
        plan.validate(min_guard_hz=150e6)

    def test_overlap_detection(self):
        bad = channels.ChannelPlan(((9.5e9, 400e6), (9.7e9, 400e6)))
        assert bad.overlaps()
        with pytest.raises(ValueError):
            bad.validate()

    def test_assignment(self):
        plan = channels.xband_5channel()
        assert plan.assign(7) == [0, 1, 2, 3, 4, 0, 1]

    def test_coexistence(self):
        plan = channels.c_x_coexistence()
        assert plan.occupied(4.2e9) and plan.occupied(10.1e9)
        assert not plan.occupied(7.0e9)
        assert plan.min_guard() == pytest.approx(10.0e9 - 400e6 - 4.8e9)
