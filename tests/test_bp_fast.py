"""Gather-free fast backprojection vs the exact (oracle-grade) BP.

The comparison oracle is ops/bp.py::backproject in f64 fed with 8x
FFT-upsampled range data (linear-interp error drops 64x), with t_start
shifted so the reference's -0.5 grid_sample offset (defined at the original
sample rate, sar_batch_sim.py:225-230) stays at the original rate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.constants import C
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
from nis_sar_amtigmti_video_tpu.ops import bp_fast
from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts, phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.utils import cplx


def _scene(n_p=192, fs=180e6, ns=1024, vel=(0.0, 0.0, 0.0), t_offset=0.0):
    sc = cfg.videosar()
    g = sc.geometry
    times = orbit.slow_time_grid(n_p / 5000.0, n_p) + t_offset
    traj = orbit.make_trajectory(g, times)
    tgts = T.PointTargets.concatenate([
        T.point_target((0.0, 0.0, 0.0), 30.0),
        T.point_target((150.0, -120.0, 0.0), 20.0),
        T.point_target((-170.0, 140.0, 0.0), 25.0),
    ])
    lam = C / 9.65e9
    opts = EchoOpts(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6, pulse_width_s=2e-6,
                    fs_hz=fs, num_samples=ns, endpoint_grid=False,
                    chirp_centering="centered", amplitude="rcs",
                    stop_and_go=True,
                    antenna_length_m=lam * g.slant_range_m / 500.0)
    t0 = window_start_time(g.slant_range_m, opts, ns / fs, "centered")
    raw = cplx.to_host(phase_history(traj, tgts, opts, t_start=t0,
                                     target_velocity=np.asarray(vel)))
    p = bp_ops.BpParams(fc_hz=opts.fc_hz, chirp_rate=opts.chirp_rate,
                        fs_hz=fs, pulse_width_s=opts.pulse_width_s,
                        num_samples=ns, nx=64, ny=64, scene_size_m=400.0,
                        precision="f64")
    return raw, traj, p, float(t0)


def _oracle_upsampled(raw, traj, p, t0, vel_focus, u=8):
    """Exact f64 BP on u-times FFT-upsampled range data."""
    n_p, ns = raw.shape
    rc = np.asarray(bp_ops.bp_range_compress(cplx.to_device(raw), p))
    spec = np.fft.fft(rc, axis=-1)
    h = ns // 2
    spec_u = np.zeros((n_p, ns * u), np.complex128)
    spec_u[:, :h] = spec[:, :h]
    spec_u[:, -h:] = spec[:, -h:]
    spec_u[:, h] *= 0.5
    spec_u[:, -h] *= 0.5
    rc_u = (np.fft.ifft(spec_u, axis=-1) * u).astype(np.complex64)
    p_u = bp_ops.BpParams(fc_hz=p.fc_hz, chirp_rate=p.chirp_rate,
                          fs_hz=p.fs_hz * u, pulse_width_s=p.pulse_width_s,
                          num_samples=ns * u, nx=p.nx, ny=p.ny,
                          scene_size_m=p.scene_size_m, precision="f64")
    t0_u = t0 + 0.5 * (u - 1) / (u * p.fs_hz)
    return np.asarray(bp_ops.backproject(
        jnp.asarray(rc_u), jnp.asarray(traj.positions),
        jnp.asarray(traj.velocities), jnp.asarray(traj.times),
        jnp.asarray(vel_focus, jnp.float64), jnp.float64(t0_u), p_u))


def _check(fast, want, peak_db=0.1, peak_phase=0.01, field=0.01):
    a_f, a_w = np.abs(fast), np.abs(want)
    pk = np.unravel_index(a_w.argmax(), a_w.shape)
    assert abs(20 * np.log10(a_f[pk] / a_w[pk])) < peak_db
    assert abs(np.angle(fast[pk] * np.conj(want[pk]))) < peak_phase
    assert np.abs(a_f - a_w).max() / a_w.max() < field


class TestFastBp:
    def test_static_scene_matches_exact(self):
        raw, traj, p, t0 = _scene()
        vf = np.zeros(3)
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p))
        _check(got, want)

    def test_mbp_moving_target(self):
        vel = (12.0, 5.0, 0.0)
        raw, traj, p, t0 = _scene(vel=vel)
        vf = np.asarray(vel)
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p))
        _check(got, want)
        # mover focused by mBP: peak on the start-position grid cell
        iy, ix = np.unravel_index(np.abs(got).argmax(), got.shape)
        x = np.linspace(-200, 200, 64)
        assert min(abs(x[ix] - 0.0), abs(x[ix] - 150.0),
                   abs(x[ix] + 170.0)) < 15

    def test_presum_within_budget(self):
        raw, traj, p, t0 = _scene(n_p=251)
        vf = np.zeros(3)
        d = bp_ops.presum_factor(p, 5000.0, C / 9.65e9,
                                 cfg.videosar().geometry.slant_range_m,
                                 cfg.videosar().geometry.effective_velocity_mps)
        assert d >= 2
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, presum=d))
        # presum adds its own validated +0.03 dB / <1% field budget
        _check(got, want, peak_db=0.15, peak_phase=0.02, field=0.015)

    def test_squinted_cpi(self):
        """CPI centred off broadside: sheared internal grid + rotated
        iso-range direction must still match the exact image."""
        raw, traj, p, t0 = _scene(n_p=192, t_offset=0.08)  # ~600 m along-track
        vf = np.zeros(3)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0)
        rdir, _, _ = bp_fast._look_geometry(
            p, traj.positions[len(traj.times) // 2])
        assert abs(rdir[1]) > 1e-4           # genuinely rotated rows
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan))
        _check(got, want, peak_db=0.12, peak_phase=0.02, field=0.012)

    def test_integer_stride_two(self):
        """fs/B = 2.4 exercises stride-2 window extraction."""
        raw, traj, p, t0 = _scene(fs=360e6, ns=2048)
        vf = np.zeros(3)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0)
        assert plan.stride == 2
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan))
        _check(got, want)

    def test_fused_compression_nonpow2(self):
        """num_samples=1000 pads to nfft=1024: the fused matched filter is
        a linear convolution at the padded length (the production shape's
        Bluestein-killer), which must still meet the oracle budgets."""
        raw, traj, p, t0 = _scene(ns=1000)
        vf = np.zeros(3)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0)
        assert plan.nfft == 1024 and plan.nfft != p.num_samples
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan))
        _check(got, want)

    @pytest.mark.parametrize("case", ["static", "mbp", "squint", "stride2",
                                      "presum"])
    def test_factorized_meets_oracle(self, case):
        """Factorized (sub-aperture) accumulation under the same oracle
        budgets as the plain fast path, across the geometry matrix."""
        kw = dict(static={}, mbp=dict(vel=(12.0, 5.0, 0.0)),
                  squint=dict(t_offset=0.08), stride2=dict(fs=360e6, ns=2048),
                  presum=dict(n_p=251))[case]
        raw, traj, p, t0 = _scene(**kw)
        vf = np.asarray(kw.get("vel", (0.0, 0.0, 0.0)), float)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0,
                                 factorize=True)
        assert plan.sub_raw > 0 and plan.nx_c > 0
        presum = 1
        ck = {}
        if case == "presum":
            presum = bp_ops.presum_factor(
                p, 5000.0, C / 9.65e9, cfg.videosar().geometry.slant_range_m,
                cfg.videosar().geometry.effective_velocity_mps)
            ck = dict(peak_db=0.15, peak_phase=0.02, field=0.015)
        elif case == "squint":
            ck = dict(peak_db=0.12, peak_phase=0.02, field=0.012)
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, presum=presum, plan=plan,
            accumulate="factor"))
        _check(got, want, **ck)

    @pytest.mark.parametrize("case", ["static", "mbp", "squint", "stride2"])
    def test_factor2_meets_oracle(self, case):
        """Two-level factorized accumulation under the same oracle budgets
        as the single-level path, across the geometry matrix."""
        kw = dict(static={}, mbp=dict(vel=(12.0, 5.0, 0.0)),
                  squint=dict(t_offset=0.08),
                  stride2=dict(fs=360e6, ns=2048))[case]
        raw, traj, p, t0 = _scene(**kw)
        vf = np.asarray(kw.get("vel", (0.0, 0.0, 0.0)), float)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0,
                                 factorize=True)
        assert plan.sub_raw1 > 0 and plan.nx_c1 > 0 and plan.grp >= 2
        ck = dict(peak_db=0.12, peak_phase=0.02,
                  field=0.012) if case == "squint" else {}
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan, accumulate="factor2"))
        _check(got, want, **ck)

    def test_factor2_matches_single_level(self):
        """factor2 vs factor on the same operands: the only differences
        allowed are the level-1 band-limited merge (~-73 dB) and the
        budget re-split."""
        raw, traj, p, t0 = _scene()
        vf = np.zeros(3)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0,
                                 factorize=True)
        assert plan.sub_raw1 > 0
        want = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan, accumulate="factor"))
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan, accumulate="factor2"))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 5e-4, err

    def test_factorized_multi_subaperture_matches_plain(self):
        """Force several small sub-apertures (sub_p exercised > 1 anchor)
        and compare against the plain accumulate on the same operands: the
        only difference allowed is the band-limited merge error."""
        raw, traj, p, t0 = _scene()
        vf = np.zeros(3)
        plan0 = bp_fast.make_plan(p, traj.positions, traj.times, t0,
                                  factorize=True)
        # shrink sub-apertures well below the planned bound (more anchors,
        # still inside the coarse band budget)
        import dataclasses
        plan = dataclasses.replace(plan0, sub_raw=max(8, plan0.sub_raw // 8))
        assert -(-raw.shape[0] // plan.sub_raw) >= 4
        want = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan, accumulate="xla"))
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan, accumulate="factor"))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 2e-3, err

    def test_pallas_accumulate_matches_xla(self):
        """Interpret-mode pixel-tile kernel vs _accumulate on the same
        synthetic operands and w_win=64 plan."""
        from nis_sar_amtigmti_video_tpu.ops.pallas import bp_kernel

        plan = bp_fast.FastBpPlan(ny_i=128, nx_i=128, w_win=64, stride=1,
                                  band_start=7, nfft=512, dx_m=1.0,
                                  t_ref=1e-3, n_org=100.0)
        rng = np.random.default_rng(3)
        n_p = 5
        rc2 = jnp.asarray(rng.standard_normal((n_p, 512))
                          + 1j * rng.standard_normal((n_p, 512)),
                          jnp.complex64)
        u0 = jnp.asarray(30.0 + 2.0 * rng.standard_normal((n_p, 128)),
                         jnp.float32)
        pa = jnp.asarray(rng.uniform(-3, 3, (n_p, 128)), jnp.float32)
        pb = jnp.asarray(0.01 * rng.standard_normal((n_p, 128)), jnp.float32)
        pc = jnp.asarray(1e-4 * rng.standard_normal((n_p, 128)), jnp.float32)
        b_t = jnp.asarray(0.05 * rng.standard_normal(n_p), jnp.float32)
        c_t = jnp.asarray(1e-4 * rng.standard_normal(n_p), jnp.float32)
        want = np.asarray(bp_fast._accumulate(rc2, u0, pa, pb, pc, b_t, c_t,
                                              plan))
        got = np.asarray(bp_kernel.accumulate_pallas(
            rc2, u0, pa, pb, pc, b_t, c_t, plan, interpret=True))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 2e-4, err

    def test_anchored_fit_matches_exact_fit(self):
        """The anchored fit + f32 derived-coefficient interpolation (the
        bench/model path) must match the exact per-pulse fit within the
        interpolation budget, and still pass the oracle gate — at BOTH
        the historic stride 8 and the round-5 adopted production stride
        16 (probe_bp_r5.py: 38.0 -> 36.8 ms/frame at 1.4e-5 image
        delta)."""
        raw, traj, p, t0 = _scene()
        vf = np.zeros(3)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0,
                                 factorize=True)
        want = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan, accumulate="factor",
            fit_stride=0))
        for stride in (8, 16):
            got = np.asarray(bp_fast.focus_bp_fast(
                cplx.to_device(raw), traj.positions, traj.velocities,
                traj.times, vf, t0, p, plan=plan, accumulate="factor",
                fit_stride=stride))
            err = np.abs(got - want).max() / np.abs(want).max()
            assert err < 1e-3, (stride, err)
            _check(got, _oracle_upsampled(raw, traj, p, t0, vf))

    def test_factor_kernel_matches_xla(self):
        """Interpret-mode factorized coarse-tile kernel vs
        _accumulate_factor on the same synthetic operands and plan."""
        from nis_sar_amtigmti_video_tpu.ops.pallas import bp_factor_kernel

        plan = bp_fast.FastBpPlan(ny_i=128, nx_i=512, w_win=32, stride=1,
                                  band_start=7, nfft=512, dx_m=1.0,
                                  t_ref=1e-3, n_org=100.0,
                                  sub_raw=4, nx_c=128)
        assert bp_factor_kernel.supported(plan)
        rng = np.random.default_rng(5)
        n_p, sub_p = 11, 4           # ragged final sub-aperture on purpose
        rc2 = jnp.asarray(rng.standard_normal((n_p, 512))
                          + 1j * rng.standard_normal((n_p, 512)),
                          jnp.complex64)
        u0 = jnp.asarray(15.0 + 2.0 * rng.standard_normal((n_p, 128)),
                         jnp.float32)
        pa = jnp.asarray(rng.uniform(-3, 3, (n_p, 128)), jnp.float32)
        pb = jnp.asarray(0.003 * rng.standard_normal((n_p, 128)), jnp.float32)
        pc = jnp.asarray(3e-6 * rng.standard_normal((n_p, 128)), jnp.float32)
        b_t = jnp.asarray(0.01 * rng.standard_normal(n_p), jnp.float32)
        c_t = jnp.asarray(1e-5 * rng.standard_normal(n_p), jnp.float32)
        want = np.asarray(bp_fast._accumulate_factor(
            rc2, u0, pa, pb, pc, b_t, c_t, plan, sub_p))
        for feed in ("windows", "spectra"):
            got = np.asarray(bp_factor_kernel.accumulate_factor_pallas(
                rc2, u0, pa, pb, pc, b_t, c_t, plan, sub_p, interpret=True,
                feed=feed))
            err = np.abs(got - want).max() / np.abs(want).max()
            assert err < 2e-4, (feed, err)

    def test_pallas_path_meets_oracle(self):
        """focus_bp_fast with the pallas accumulate (interpret mode, w=64
        plan) against the upsampled f64 oracle."""
        raw, traj, p, t0 = _scene()
        vf = np.zeros(3)
        plan = bp_fast.make_plan(p, traj.positions, traj.times, t0, w_win=64)
        from nis_sar_amtigmti_video_tpu.ops.pallas import bp_kernel
        assert bp_kernel.supported(plan)
        want = _oracle_upsampled(raw, traj, p, t0, vf)
        got = np.asarray(bp_fast.focus_bp_fast(
            cplx.to_device(raw), traj.positions, traj.velocities,
            traj.times, vf, t0, p, plan=plan,
            accumulate="pallas_interpret"))
        _check(got, want)

    def test_pallas_recenter_presum_matches_xla(self):
        """Fused compress+recentre+presum four-step FFT kernel (interpret)
        vs recenter_presum with the same fused matched filter."""
        from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel

        rng = np.random.default_rng(7)
        n_p, ns = 6, 10000                    # nfft = 16384 (B1 = 128)
        sc = cfg.videosar()
        g = sc.geometry
        times = orbit.slow_time_grid(n_p / 5000.0, n_p)
        traj = orbit.make_trajectory(g, times)
        p = bp_ops.BpParams(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6,
                            fs_hz=180e6, pulse_width_s=2e-6,
                            num_samples=ns, nx=64, ny=64,
                            scene_size_m=400.0)
        t_ref = float(2.0 * np.linalg.norm(traj.positions, axis=1).mean()
                      / C)
        rc = jnp.asarray(rng.standard_normal((n_p, ns))
                         + 1j * rng.standard_normal((n_p, ns)),
                         jnp.complex64)
        pos = jnp.asarray(traj.positions)
        vel = jnp.asarray(traj.velocities)
        ts = jnp.asarray(traj.times)
        vf = jnp.zeros(3, jnp.float64)
        d = 3
        ref_conj = bp_fast.matched_filter_spectrum(p, 16384)
        want = bp_fast.recenter_presum(rc, pos, vel, ts, vf, p, d, t_ref,
                                       ref_conj=ref_conj)
        got = fft_kernel.recenter_presum_pallas(rc, pos, vel, ts, vf, p, d,
                                                t_ref, interpret=True)
        w0 = np.asarray(want[0])
        g0 = np.asarray(got[0])
        assert g0.shape == w0.shape
        err = np.abs(g0 - w0).max() / np.abs(w0).max()
        assert err < 3e-4, err
        for a, b in zip(want[1:], got[1:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_streaming_spectra_split_matches_fused(self):
        """The streaming-VideoSAR recentre split (cacheable forward spectra
        + per-frame ramp/presum/inverse) must reproduce the fused recentre
        kernel exactly, and the focus_bp_fast raw_spectra= entry must match
        the raw-pulse path within the recentre kernel's f32 class."""
        from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel

        rng = np.random.default_rng(8)
        n_p, ns = 6, 10000                    # nfft = 16384 (B1 = 128)
        sc = cfg.videosar()
        g = sc.geometry
        times = orbit.slow_time_grid(n_p / 5000.0, n_p)
        traj = orbit.make_trajectory(g, times)
        p = bp_ops.BpParams(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6,
                            fs_hz=180e6, pulse_width_s=2e-6,
                            num_samples=ns, nx=64, ny=64,
                            scene_size_m=400.0)
        t_ref = float(2.0 * np.linalg.norm(traj.positions, axis=1).mean()
                      / C)
        rc = jnp.asarray(rng.standard_normal((n_p, ns))
                         + 1j * rng.standard_normal((n_p, ns)),
                         jnp.complex64)
        pos = jnp.asarray(traj.positions)
        vel = jnp.asarray(traj.velocities)
        ts = jnp.asarray(traj.times)
        vf = jnp.zeros(3, jnp.float64)
        d = 3
        # kernel level: split == fused, bit-for-bit (same dots, same ramp)
        fused = fft_kernel.recenter_presum_pallas(rc, pos, vel, ts, vf, p,
                                                  d, t_ref, interpret=True)
        spec = fft_kernel.forward_spectra_pallas(rc, p, interpret=True)
        split = fft_kernel.recentre_from_spectra_pallas(
            spec, pos, vel, ts, vf, p, d, t_ref, interpret=True)
        np.testing.assert_allclose(np.asarray(split[0]),
                                   np.asarray(fused[0]), rtol=0, atol=0)
        # focus level: raw_spectra= == raw-pulse path (XLA recentre there,
        # f32 factored ramps here: the recenter kernel's tolerance class)
        t0 = t_ref - 0.5 * ns / p.fs_hz
        plan = bp_fast.make_plan(p, np.asarray(traj.positions),
                                 np.asarray(traj.times), float(t0))
        want = np.asarray(bp_fast.focus_bp_fast(
            rc, pos, vel, ts, vf, t0, p, plan=plan, accumulate="xla"))
        got = np.asarray(bp_fast.focus_bp_fast(
            None, pos, vel, ts, vf, t0, p, plan=plan, accumulate="xla",
            raw_spectra=bp_fast.forward_spectra(rc, p)))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-3, err

    def test_streaming_ring_offset_matches_chronological(self):
        """A ring-ordered spectra buffer (slot j = chronological pulse
        (j - off) % P) with ring_offset=off must reproduce the
        chronological split call: the streaming product advances the
        cached-spectra window by dynamic_update_slice instead of
        re-concatenating it each frame."""
        from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel

        rng = np.random.default_rng(11)
        n_p, ns, d = 12, 10000, 3             # blk = d*groups = 6 | 12
        sc = cfg.videosar()
        g = sc.geometry
        times = orbit.slow_time_grid(n_p / 5000.0, n_p)
        traj = orbit.make_trajectory(g, times)
        p = bp_ops.BpParams(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6,
                            fs_hz=180e6, pulse_width_s=2e-6,
                            num_samples=ns, nx=64, ny=64,
                            scene_size_m=400.0)
        t_ref = float(2.0 * np.linalg.norm(traj.positions, axis=1).mean()
                      / C)
        rc = jnp.asarray(rng.standard_normal((n_p, ns))
                         + 1j * rng.standard_normal((n_p, ns)),
                         jnp.complex64)
        pos = jnp.asarray(traj.positions)
        vel = jnp.asarray(traj.velocities)
        ts = jnp.asarray(traj.times)
        vf = jnp.zeros(3, jnp.float64)
        spec = fft_kernel.forward_spectra_pallas(rc, p, interpret=True)
        want = fft_kernel.recentre_from_spectra_pallas(
            spec, pos, vel, ts, vf, p, d, t_ref, interpret=True)
        for off in (3, 6, 9):                 # multiples of d, incl. != blk
            ring = jnp.roll(spec, off, axis=0)
            got = fft_kernel.recentre_from_spectra_pallas(
                ring, pos, vel, ts, vf, p, d, t_ref, interpret=True,
                ring_offset=jnp.int32(off))
            # blk=6 forces the ring call onto the wide scalar layout
            # (statically unrolled presum); XLA-CPU interpret fuses the
            # unrolled ramp into FMAs, so ring-vs-chronological differs at
            # the FMA class here (on TPU the two layouts measure exactly
            # equal — scripts/probe_bp_stream.py rel-err 0.0)
            np.testing.assert_allclose(np.asarray(got[0]),
                                       np.asarray(want[0]), rtol=0,
                                       atol=5e-6 * float(
                                           np.abs(want[0]).max()))
            for a, b in zip(want[1:], got[1:]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        with pytest.raises(ValueError, match="ring_offset"):
            fft_kernel.recentre_from_spectra_pallas(
                spec[:-2], pos[:-2], vel[:-2], ts[:-2], vf, p, d, t_ref,
                interpret=True, ring_offset=jnp.int32(3))
        # focus level: a ring-ordered buffer + ring_offset == chronological
        t0 = t_ref - 0.5 * ns / p.fs_hz
        plan = bp_fast.make_plan(p, np.asarray(traj.positions),
                                 np.asarray(traj.times), float(t0))
        want_img = np.asarray(bp_fast.focus_bp_fast(
            None, pos, vel, ts, vf, t0, p, presum=d, plan=plan,
            accumulate="xla", raw_spectra=spec))
        got_img = np.asarray(bp_fast.focus_bp_fast(
            None, pos, vel, ts, vf, t0, p, presum=d, plan=plan,
            accumulate="xla", raw_spectra=jnp.roll(spec, 6, axis=0),
            ring_offset=jnp.int32(6)))
        err = np.abs(got_img - want_img).max() / np.abs(want_img).max()
        assert err < 1e-6, err

    def test_band_does_not_fit_raises(self):
        raw, traj, p, t0 = _scene(ns=512)
        big = bp_ops.BpParams(fc_hz=p.fc_hz, chirp_rate=p.chirp_rate,
                              fs_hz=p.fs_hz, pulse_width_s=p.pulse_width_s,
                              num_samples=512, nx=64, ny=64,
                              scene_size_m=3000.0)
        with pytest.raises(ValueError, match="does not fit"):
            bp_fast.make_plan(big, traj.positions, traj.times, t0)
