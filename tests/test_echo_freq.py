"""Frequency-domain (NUFFT) echo backend: fidelity class + speed contract."""

import numpy as np
import pytest

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts, phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field
from nis_sar_amtigmti_video_tpu.utils import cplx

KR = 50e6 / 2e-6   # BW 50 MHz < fs 60 MHz: physical waveform


def _opts(backend, **kw):
    base = dict(fc_hz=9.65e9, chirp_rate=KR, pulse_width_s=2e-6, fs_hz=60e6,
                num_samples=360, endpoint_grid=False,
                chirp_centering="leading", backend=backend)
    base.update(kw)
    return EchoOpts(**base)


def _compress(raw):
    mf = np.conj(np.exp(1j * np.pi * KR * np.linspace(-1e-6, 1e-6, 121) ** 2))
    return np.apply_along_axis(lambda r: np.convolve(r, mf, "same"), 1, raw)


class TestFreqBackend:
    @pytest.fixture(scope="class")
    def scene(self):
        g = cfg.satellite_stripmap().geometry
        traj = orbit.make_trajectory(g, orbit.slow_time_grid(8 / 6000.0, 8))
        rng = np.random.default_rng(0)
        tgts = T.PointTargets.concatenate(
            [T.destroyer(), ocean_clutter_field(rng, 100, 400.0)])
        t0 = window_start_time(g.slant_range_m, _opts("jnp"), 360 / 60e6,
                               "centered")
        return g, traj, tgts, t0

    def test_peak_fidelity_golden(self, scene):
        """Bright pixels in an interference-rich scene: <0.02 dB amplitude,
        <2e-3 rad phase vs the direct engine — inside the BASELINE golden
        budget (0.1 dB / 1e-3 rad applies to the focused image, where the
        per-pixel raw error averages further down)."""
        g, traj, tgts, t0 = scene
        a = _compress(cplx.to_host(
            phase_history(traj, tgts, _opts("jnp"), t_start=t0)))
        b = _compress(cplx.to_host(
            phase_history(traj, tgts, _opts("freq"), t_start=t0)))
        bright = np.abs(a) > 0.5 * np.abs(a).max()
        ratio = 20 * np.log10(np.abs(b[bright]) / np.abs(a[bright]))
        dphi = np.angle(b[bright] * np.conj(a[bright]))
        assert np.abs(ratio).max() < 0.02
        assert np.abs(dphi).max() < 2e-3

    def test_field_error_floor(self, scene):
        """Raw field RMS error < -55 dB (exact-edge split, os=2)."""
        g, traj, tgts, t0 = scene
        a = cplx.to_host(phase_history(traj, tgts, _opts("jnp"), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq"), t_start=t0))
        err_db = 10 * np.log10(np.mean(np.abs(a - b) ** 2)
                               / np.mean(np.abs(a) ** 2))
        assert err_db < -55.0

    def test_approximate_mode_still_available(self, scene):
        """freq_edge_taper=0 keeps the cheaper round-1 approximate class
        (~-25 dB floor) for bulk data generation."""
        g, traj, tgts, t0 = scene
        a = cplx.to_host(phase_history(traj, tgts, _opts("jnp"), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_oversample=4, freq_edge_taper=0.0),
            t_start=t0))
        err_db = 10 * np.log10(np.mean(np.abs(a - b) ** 2)
                               / np.mean(np.abs(a) ** 2))
        assert -40.0 < err_db < -25.0

    def test_dense_spreader_matches_scatter(self, scene):
        """The one-hot MXU spreader (the TPU 'auto' pick) must reproduce
        the scatter path on a delay-sorted interference-rich scene — the
        adoption gate for every dense-path restructuring."""
        g, traj, tgts, t0 = scene
        a = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_spreader="scatter"), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_spreader="dense"), t_start=t0))
        assert np.abs(b - a).max() < 2e-5 * np.abs(a).max()

    def test_dense_spreader_group_sizing(self, scene):
        """Tighter group windows (the HBM-bill knob) must stay exact while
        every group's delay span fits the window."""
        g, traj, tgts, t0 = scene
        a = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_spreader="scatter"), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_spreader="dense",
                              freq_spread_win=1024, freq_spread_grp=32),
            t_start=t0))
        assert np.abs(b - a).max() < 2e-5 * np.abs(a).max()

    def test_dense_kernel_matches_dense_e2e(self, scene):
        """The VMEM one-hot kernel (interpret mode) must reproduce the XLA
        dense spreader through the full freq backend — exercises both the
        main-pass single set and the shared two-set exact-edge pass."""
        g, traj, tgts, t0 = scene
        a = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_spreader="dense"), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq",
                              freq_spreader="dense_kernel_interpret"),
            t_start=t0))
        assert np.abs(b - a).max() < 1e-6 * np.abs(a).max()

    def test_dense_kernel_qr_matches_dense_e2e(self, scene):
        """The digit-factorized (qr) spread kernel through the full freq
        backend: f32-rounding-class equal to the XLA dense spreader (the
        taps ride one MXU accumulator instead of the roll chain, so the
        sums reassociate — not bit-identical like the plain kernel)."""
        g, traj, tgts, t0 = scene
        a = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_spreader="dense"), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq",
                              freq_spreader="dense_kernel_qr_interpret"),
            t_start=t0))
        assert np.abs(b - a).max() < 1e-5 * np.abs(a).max()

    def test_dense_kernel_qr_spread_unit(self):
        """_spread_dense impl='pallas_qr_interpret' == impl='xla' on a raw
        multi-set spread with out-of-grid targets and duplicate cells."""
        from nis_sar_amtigmti_video_tpu.ops import echo_freq as ef
        import jax.numpy as jnp
        rng = np.random.default_rng(7)
        pc, num_b, k, l_out = 3, 200, 6, 900
        i0 = np.sort(rng.integers(-40, l_out + 20, (pc, num_b)), axis=1)
        sets = []
        for off in (0, 37):
            vr = rng.normal(size=(pc, num_b, k)).astype(np.float32)
            vi = rng.normal(size=(pc, num_b, k)).astype(np.float32)
            sets.append((jnp.asarray(vr), jnp.asarray(vi), off))
        args = (jnp.asarray(i0, jnp.int32), sets, l_out, 512, 8)
        ar, ai = ef._spread_dense(*args, lo=64, impl="xla")
        br, bi = ef._spread_dense(*args, lo=64, impl="pallas_qr_interpret")
        scale = float(np.abs(np.asarray(ar)).max()) + 1e-9
        assert np.abs(np.asarray(br) - np.asarray(ar)).max() < 1e-5 * scale
        assert np.abs(np.asarray(bi) - np.asarray(ai)).max() < 1e-5 * scale

    @pytest.mark.parametrize("impl", ["pallas_interpret",
                                      "pallas_qr_interpret"])
    def test_spread_kernel_drops_all_taps_of_masked_targets(self, impl):
        """A target dropped by the group cell-spread rule (c = -1 with
        nonzero tap values) must deposit NOTHING at any tap. The qr
        kernel's per-tap digit one-hot re-enters the valid range at
        c + k for k >= 1 unless the mask is pinned per tap."""
        from nis_sar_amtigmti_video_tpu.ops import echo_freq as ef
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        pc, num_b, k, l_out, win, grp = 2, 8, 6, 600, 128, 2
        # one group spans cells 0..400 > win - k: the far targets get
        # masked to c = -1 while carrying nonzero values
        i0 = np.tile(np.array([[0, 5, 9, 400, 0, 3, 7, 420]]), (pc, 1))
        vr = rng.normal(size=(pc, num_b, k)).astype(np.float32)
        vi = rng.normal(size=(pc, num_b, k)).astype(np.float32)
        args = (jnp.asarray(i0, jnp.int32), [(jnp.asarray(vr),
                                              jnp.asarray(vi), 0)],
                l_out, win, grp)
        ar, ai = ef._spread_dense(*args, lo=16, impl="xla")
        br, bi = ef._spread_dense(*args, lo=16, impl=impl)
        scale = float(np.abs(np.asarray(ar)).max()) + 1e-9
        assert np.abs(np.asarray(br) - np.asarray(ar)).max() < 1e-5 * scale
        assert np.abs(np.asarray(bi) - np.asarray(ai)).max() < 1e-5 * scale

    def test_geom_interp_split_matches_f64(self, scene):
        """freq_geom_interp='split' (f64 only at the anchors; f32 delta
        interpolation + per-anchor carrier wrap) vs the full-f64
        interpolation: ~1e-5 rad carrier class, far inside the golden
        budgets."""
        g, _, tgts, t0 = scene
        # 64 pulses > 3*stride so the anchored-interpolation branch (the
        # one 'split' changes) actually runs
        traj = orbit.make_trajectory(g, orbit.slow_time_grid(64 / 6000.0,
                                                             64))
        a = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_geom_stride=8), t_start=t0))
        b = cplx.to_host(phase_history(
            traj, tgts, _opts("freq", freq_geom_stride=8,
                              freq_geom_interp="split"), t_start=t0))
        assert np.abs(b - a).max() < 2e-4 * np.abs(a).max()

    def test_geom_interp_rejects_bad_string(self, scene):
        g, traj, tgts, t0 = scene
        with pytest.raises(ValueError, match="freq_geom_interp"):
            phase_history(traj, tgts,
                          _opts("freq", freq_geom_interp="fast"),
                          t_start=t0)

    def test_dense_kernel_spread_unit(self):
        """_spread_dense impl='pallas_interpret' == impl='xla' on a raw
        multi-set spread with out-of-grid targets and duplicate cells."""
        from nis_sar_amtigmti_video_tpu.ops import echo_freq as ef
        import jax.numpy as jnp
        rng = np.random.default_rng(7)
        pc, num_b, k, l_out = 3, 200, 6, 900
        i0 = np.sort(rng.integers(-40, l_out + 20, (pc, num_b)), axis=1)
        sets = []
        for off in (0, 37):
            vr = rng.normal(size=(pc, num_b, k)).astype(np.float32)
            vi = rng.normal(size=(pc, num_b, k)).astype(np.float32)
            sets.append((jnp.asarray(vr), jnp.asarray(vi), off))
        args = (jnp.asarray(i0, jnp.int32), sets, l_out, 512, 8)
        ar, ai = ef._spread_dense(*args, lo=64, impl="xla")
        br, bi = ef._spread_dense(*args, lo=64, impl="pallas_interpret")
        scale = float(np.abs(np.asarray(ar)).max()) + 1e-9
        assert np.abs(np.asarray(br) - np.asarray(ar)).max() < 1e-5 * scale
        assert np.abs(np.asarray(bi) - np.asarray(ai)).max() < 1e-5 * scale

    def test_fused_conv_matches_xla(self):
        """conv='pallas_interpret' (fused four-step FFT convolution) ==
        conv='xla' through synthesize at a window long enough for the
        kernel's supported FFT range (l_fft >= 16384)."""
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.ops import echo_freq as ef
        from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel
        opts = _opts("freq", num_samples=4000)
        rng = np.random.default_rng(11)
        P, B = 3, 48
        tau = jnp.asarray(np.sort(rng.uniform(5e-6, 5.5e-5, (P, B)), axis=1))
        car = jnp.asarray(rng.uniform(-np.pi, np.pi, (P, B)
                                      ).astype(np.float32))
        amp = jnp.asarray(rng.uniform(0.5, 2.0, (P, B)).astype(np.float32))
        # self-check: this shape must actually reach the kernel (no silent
        # xla fallback making the comparison vacuous)
        os_ = opts.freq_oversample
        lead = int(round(opts.pulse_width_s * opts.fs_hz * os_)) + os_ + 8
        l_fft = 1 << (lead + 4000 * os_ + os_ + 8 - 1).bit_length()
        assert fft_kernel.supported(l_fft)
        a = np.asarray(ef.synthesize(tau, car, amp, opts, conv="xla"))
        b = np.asarray(ef.synthesize(tau, car, amp, opts,
                                     conv="pallas_interpret"))
        assert np.abs(b - a).max() < 3e-5 * np.abs(a).max()

    def test_endpoint_grid_rejected(self, scene):
        g, traj, tgts, t0 = scene
        with pytest.raises(ValueError, match="uniform fast-time"):
            phase_history(traj, tgts,
                          _opts("freq", endpoint_grid=True), t_start=t0)

    def test_empty_window_targets_drop(self, scene):
        """Targets whose echo misses the window contribute nothing (no NaN,
        no wraparound)."""
        g, traj, _, t0 = scene
        far = T.point_target((0.0, 30000.0, 0.0), 1e6)   # way out of window
        r = cplx.to_host(phase_history(traj, far,
                                       _opts("freq"), t_start=t0))
        assert np.isfinite(r).all()
        assert np.abs(r).max() < 1e-3

    def test_multi_channel_batched_equals_per_channel(self):
        """The freq backend's channel-batched dispatch (both channels'
        scalar fields stacked on the pulse axis through ONE synthesize
        program — ops/echo.py::multi_channel_phase_history) must match
        per-channel calls to f32-ULP class: every per-row stage (group
        spread, conv row FFT, edge pass) is pulse-row independent, so
        only backend association order (the CPU scatter path re-orders
        adds under a different batch shape) may differ — never values.
        40 pulses exercises the anchored-geometry path (num_p >
        3*stride)."""
        from nis_sar_amtigmti_video_tpu.ops.echo import (
            multi_channel_phase_history)

        g = cfg.satellite_stripmap().geometry
        traj = orbit.make_trajectory(g, orbit.slow_time_grid(40 / 6000.0, 40))
        rng = np.random.default_rng(3)
        tgts = T.PointTargets.concatenate(
            [T.destroyer(), ocean_clutter_field(rng, 80, 400.0)])
        t0 = window_start_time(g.slant_range_m, _opts("jnp"), 360 / 60e6,
                               "centered")
        offs = (-1.3, 1.3)
        b1, b2 = multi_channel_phase_history(traj, tgts, _opts("freq"),
                                             t_start=t0, rx_offsets=offs)
        r1 = phase_history(traj, tgts, _opts("freq"), t_start=t0,
                           rx_offset=offs[0])
        r2 = phase_history(traj, tgts, _opts("freq"), t_start=t0,
                           rx_offset=offs[1])
        assert b1.shape == r1.shape
        for b, r in ((b1, r1), (b2, r2)):
            bh, rh = cplx.to_host(b), cplx.to_host(r)
            tol = 3e-6 * np.abs(rh).max()
            np.testing.assert_allclose(bh, rh, rtol=0, atol=tol)
