"""HRWS reconstruction: multichannel unfolding must recover a sub-Nyquist
Doppler spectrum and suppress azimuth ghosts (the physics the reference's
'doppler ambiguity' demo shows at low PRF)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu.models import hrws
from nis_sar_amtigmti_video_tpu.utils import cplx


def synth_multichannel(p: hrws.HrwsParams, n_az: int, n_rg: int,
                       doppler_tones):
    """Synthetic signal: sum of Doppler tones at frequencies beyond the base
    PRF Nyquist, sampled by each channel with its x_k/(2V) slow-time delay."""
    t = np.arange(n_az) / p.prf_hz
    offs = p.rx_offsets()
    chans = np.zeros((p.num_channels, n_az, n_rg), np.complex64)
    for k, x in enumerate(offs):
        tk = t + x / (2.0 * p.velocity_mps)
        sig = np.zeros(n_az, np.complex128)
        for f0, amp in doppler_tones:
            sig += amp * np.exp(2j * np.pi * f0 * tk)
        chans[k] = sig[:, None].astype(np.complex64)
    return jnp.asarray(chans)


class TestReconstruction:
    def test_recovers_out_of_band_tone(self):
        """A tone at 1.4x the base Nyquist aliases in any single channel but
        lands at its true frequency after 2-channel unfolding."""
        prf, v = 1000.0, 7000.0
        p = hrws.HrwsParams(num_channels=2, spacing_m=2 * v / prf / 2,
                            prf_hz=prf, velocity_mps=v)
        n_az = 128
        f_true = 700.0   # beyond +/-500 Hz single-channel band
        chans = synth_multichannel(p, n_az, 4, [(f_true, 1.0)])
        rec = cplx.to_host(hrws.reconstruct(chans, p))
        assert rec.shape == (2 * n_az, 4)
        spec = np.abs(np.fft.fft(rec[:, 0]))
        freqs = np.fft.fftfreq(2 * n_az, 1.0 / (2 * prf))
        f_peak = freqs[spec.argmax()]
        assert f_peak == pytest.approx(f_true, abs=2 * prf / (2 * n_az))

    def test_ghost_suppression(self):
        """Two tones (one in-band, one aliasing onto a distinct bin): single-
        channel spectrum shows the ghost at the aliased position; the
        reconstructed spectrum puts each at its true position with the ghost
        suppressed by >20 dB."""
        prf, v = 1000.0, 7000.0
        p = hrws.HrwsParams(num_channels=2, spacing_m=v / prf,
                            prf_hz=prf, velocity_mps=v)
        n_az = 256
        tones = [(200.0, 1.0), (800.0, 1.0)]   # 800 aliases to -200 in-band
        chans = synth_multichannel(p, n_az, 2, tones)

        # single channel: ghost at -200 Hz
        s1 = np.abs(np.fft.fft(np.asarray(cplx.to_host(chans[0]))[:, 0]))
        f1 = np.fft.fftfreq(n_az, 1.0 / prf)
        ghost_bin = np.argmin(np.abs(f1 - (-200.0)))
        assert s1[ghost_bin] > 0.5 * s1.max()   # aliased energy present

        rec = cplx.to_host(hrws.reconstruct(chans, p))
        spec = np.abs(np.fft.fft(rec[:, 0]))
        freqs = np.fft.fftfreq(2 * n_az, 1.0 / (2 * prf))
        b200 = np.argmin(np.abs(freqs - 200.0))
        b800 = np.argmin(np.abs(freqs - 800.0))
        bm200 = np.argmin(np.abs(freqs - (-200.0)))
        bm800 = np.argmin(np.abs(freqs - (-800.0)))
        # true tones present
        assert spec[b200] > 0.4 * spec.max()
        assert spec[b800] > 0.4 * spec.max()
        # ghosts (mirror positions) suppressed by >20 dB
        assert spec[bm200] < 0.1 * spec[b200]
        assert spec[bm800] < 0.1 * spec[b800]

    def test_four_channels(self):
        prf, v = 500.0, 7000.0
        p = hrws.HrwsParams(num_channels=4, spacing_m=2 * v / (4 * prf),
                            prf_hz=prf, velocity_mps=v)
        n_az = 64
        f_true = 900.0   # needs 4x unfolding (span 2000 Hz)
        chans = synth_multichannel(p, n_az, 2, [(f_true, 1.0)])
        rec = cplx.to_host(hrws.reconstruct(chans, p))
        spec = np.abs(np.fft.fft(rec[:, 0]))
        freqs = np.fft.fftfreq(4 * n_az, 1.0 / (4 * prf))
        assert freqs[spec.argmax()] == pytest.approx(
            f_true, abs=4 * prf / (4 * n_az))

    def test_dpca_condition(self):
        assert hrws.dpca_condition_prf(7000.0, 2.8) == pytest.approx(5000.0)
        assert hrws.ghost_free_prf(6000.0, 4) == pytest.approx(1500.0)


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
class TestShardedReconstruction:
    """SURVEY §2.10: the per-Doppler-bin solve sharded over range bins, on
    the 8-device virtual CPU mesh (equality vs single-device)."""

    def test_sharded_equals_single_device(self):
        from nis_sar_amtigmti_video_tpu.parallel import mesh as mesh_mod

        prf, v = 1000.0, 7000.0
        p = hrws.HrwsParams(num_channels=2, spacing_m=v / prf,
                            prf_hz=prf, velocity_mps=v)
        rng = np.random.default_rng(5)
        chans = jnp.asarray(
            rng.standard_normal((2, 64, 128))
            + 1j * rng.standard_normal((2, 64, 128)), jnp.complex64)
        want = cplx.to_host(hrws.reconstruct(chans, p))
        m = mesh_mod.make_mesh((1, 1, 8))
        got = cplx.to_host(hrws.reconstruct_sharded(chans, p, m, axis="seq"))
        np.testing.assert_allclose(got, want,
                                   atol=1e-5 * np.abs(want).max())
        # the freq-backend tuple form goes through the same path
        got_t = cplx.to_host(hrws.reconstruct_sharded(
            (chans[0], chans[1]), p, m, axis="seq"))
        np.testing.assert_allclose(got_t, want,
                                   atol=1e-5 * np.abs(want).max())

    def test_end_to_end_pipeline_ghost_suppression(self):
        """collect_reconstruct_focus at a CI-scale HRWS collection: the
        sub-Nyquist 2-channel collect, range-sharded reconstruction and
        sequence-parallel CSA must focus a point target without the azimuth
        ghosts a single channel shows (doppler ambiguity.html:556-570),
        and equal the unsharded chain."""
        from nis_sar_amtigmti_video_tpu import config as cfg
        from nis_sar_amtigmti_video_tpu.geometry import orbit
        from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
        from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts,
                                                         window_start_time)
        from nis_sar_amtigmti_video_tpu.parallel import mesh as mesh_mod
        from nis_sar_amtigmti_video_tpu.scene import targets as T

        sc = cfg.satellite_stripmap()
        g = sc.geometry
        v_eff = g.effective_velocity_mps
        prf_sys = 1500.0                     # deliberately sub-Nyquist
        # CPI sized so the Doppler span (Ka*T ~ 2.4 kHz) exceeds the system
        # PRF (single channel aliases) but not the 2x-unfolded band
        n_p, n_s = 512, 256
        p = hrws.HrwsParams(
            num_channels=2,
            spacing_m=hrws.uniform_sampling_spacing(v_eff, prf_sys, 2),
            prf_hz=prf_sys, velocity_mps=v_eff)
        traj = orbit.make_trajectory(
            g, orbit.slow_time_grid(n_p / prf_sys, n_p))
        opts = EchoOpts(fc_hz=sc.radar.fc_hz, chirp_rate=50e6 / 2e-6,
                        pulse_width_s=2e-6, fs_hz=60e6, num_samples=n_s,
                        endpoint_grid=False, chirp_centering="centered")
        t0 = window_start_time(g.slant_range_m, opts, n_s / opts.fs_hz,
                               "centered")
        pc = csa_ops.CsaParams(
            wavelength_m=sc.radar.wavelength_m, chirp_rate=opts.chirp_rate,
            fs_hz=opts.fs_hz, prf_hz=2 * prf_sys, velocity_mps=v_eff,
            range_ref_m=g.slant_range_m, t_start_fast=float(t0),
            num_pulses=2 * n_p, num_samples=n_s)
        tgts = T.point_target((0.0, 0.0, 0.0), 100.0)

        rec, slc = hrws.collect_reconstruct_focus(
            traj, tgts, opts, p, pc, t_start=float(t0))
        m = mesh_mod.make_mesh((1, 1, 8))
        rec_s, slc_s = hrws.collect_reconstruct_focus(
            traj, tgts, opts, p, pc, t_start=float(t0), mesh=m)
        np.testing.assert_allclose(cplx.to_host(rec_s), cplx.to_host(rec),
                                   atol=2e-5 * np.abs(np.asarray(
                                       cplx.to_host(rec))).max())
        img = np.abs(cplx.to_host(slc))
        img_s = np.abs(cplx.to_host(slc_s))
        np.testing.assert_allclose(img_s, img, atol=1e-3 * img.max())

        # ghost suppression in the focused azimuth profile: energy away
        # from the target's main lobe (aliased-Doppler ghosts land at
        # +/- PRF/Ka seconds of azimuth) must be >20 dB down after
        # reconstruction, while the single-channel image at the system PRF
        # really does show the ghost
        def worst_ghost(img2d, guard):
            prof = img2d[:, np.argmax(img2d.max(axis=0))].copy()
            pk = int(prof.argmax())
            peak = prof[pk]
            n = prof.shape[0]
            idx = np.arange(n)
            d = np.minimum((idx - pk) % n, (pk - idx) % n)
            prof[d <= guard] = 0.0
            return float(prof.max() / peak)

        assert worst_ghost(img, guard=48) < 0.1          # reconstructed
        from nis_sar_amtigmti_video_tpu.ops.echo import phase_history
        raw1 = phase_history(traj, tgts, opts, t_start=float(t0))
        pc1 = csa_ops.CsaParams(
            wavelength_m=pc.wavelength_m, chirp_rate=pc.chirp_rate,
            fs_hz=pc.fs_hz, prf_hz=prf_sys, velocity_mps=v_eff,
            range_ref_m=pc.range_ref_m, t_start_fast=pc.t_start_fast,
            num_pulses=n_p, num_samples=n_s)
        img1 = np.abs(cplx.to_host(csa_ops.focus_csa(raw1, pc1)))
        assert worst_ghost(img1, guard=24) > 0.2         # ambiguity present
