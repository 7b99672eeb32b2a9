"""End-to-end model pipeline tests: stripmap, moving-target, VideoSAR."""

import dataclasses

import numpy as np
import pytest
import jax

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.gmti import velocity
from nis_sar_amtigmti_video_tpu.models import stripmap, videosar
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.utils import cplx

C = 299792458.0


def reduced_stripmap(n_pulses=192, algorithm="rda"):
    sc = cfg.satellite_stripmap()
    return sc.replace(
        radar=dataclasses.replace(sc.radar, bandwidth_hz=300e6,
                                  pulse_width_s=2e-6, fs_hz=150e6),
        collect=dataclasses.replace(sc.collect,
                                    integration_time_s=n_pulses / 6000.0,
                                    window_length_s=768 / 150e6),
        processing=dataclasses.replace(sc.processing, algorithm=algorithm),
    )


class TestStripmap:
    @pytest.mark.parametrize("algorithm", ["rda", "csa"])
    def test_point_target_focuses(self, algorithm):
        sc = reduced_stripmap(algorithm=algorithm)
        prod = stripmap.run(sc, T.point_target((0.0, 0.0, 0.0), 100.0))
        img = np.abs(cplx.to_host(prod.image))
        # energy concentrates: peak/mean is large after focusing (CSA has no
        # sidelobe taper in the reference formulation, so its floor is higher)
        assert img.max() / img.mean() > 150.0
        assert prod.range_axis.shape[0] == img.shape[1]
        assert prod.cross_range.shape[0] == img.shape[0]

    def test_noise_changes_field_not_peak(self):
        sc = reduced_stripmap()
        clean = stripmap.run(sc, T.point_target((0.0, 0.0, 0.0), 1e4))
        noisy = stripmap.run(sc, T.point_target((0.0, 0.0, 0.0), 1e4),
                             key=jax.random.PRNGKey(0), avg_rcs=1e8)
        ic = np.abs(cplx.to_host(clean.image))
        im = np.abs(cplx.to_host(noisy.image))
        assert not np.allclose(ic, im)
        # peak position unchanged by noise at this SNR
        assert np.unravel_index(ic.argmax(), ic.shape) == \
            np.unravel_index(im.argmax(), im.shape)

    def test_mover_azimuth_displacement(self):
        """A radial mover appears azimuth-shifted by v_r*R/V (the classic
        GMTI signature the moving-scenario sims demonstrate)."""
        sc = reduced_stripmap(n_pulses=256, algorithm="rda")
        still = stripmap.run(sc, T.point_target((0.0, 0.0, 0.0), 100.0))
        vy_ground = 0.0
        vx = 4.0
        mov = stripmap.run(sc, T.point_target((0.0, 0.0, 0.0), 100.0),
                           target_velocity=(0.0, vx, 0.0))
        # along-track axis is 'x' here: radial motion = y toward/away sensor
        i_s = np.abs(cplx.to_host(still.image))
        i_m = np.abs(cplx.to_host(mov.image))
        a_s = np.unravel_index(i_s.argmax(), i_s.shape)[0]
        a_m = np.unravel_index(i_m.argmax(), i_m.shape)[0]
        g = sc.geometry
        v_r = vx * np.sin(g.incidence_angle_rad)  # y is cross-track here
        n_az = i_s.shape[0]
        expect_cells = abs(velocity.azimuth_displacement(
            v_r, g.slant_range_m, g.effective_velocity_mps)) / (
                (still.cross_range[1] - still.cross_range[0]))
        # azimuth compression is FFT-circular: displacement wraps mod n_az
        expect_cells = min(expect_cells % n_az, n_az - expect_cells % n_az)
        got_cells = abs(a_m - a_s)
        got_cells = min(got_cells, n_az - got_cells)
        assert got_cells == pytest.approx(expect_cells, rel=0.3)


class TestVideoSar:
    def _reduced(self):
        sc = cfg.videosar()
        # B < fs keeps the reduced waveform physical (the production preset
        # has fs/B = 1.2); an aliased chirp would exercise nothing real
        return sc.replace(
            radar=dataclasses.replace(sc.radar, bandwidth_hz=120e6,
                                      pulse_width_s=2e-6, fs_hz=150e6,
                                      prf_hz=1000.0),
            collect=dataclasses.replace(sc.collect,
                                        window_length_s=512 / 150e6),
            processing=dataclasses.replace(sc.processing, bp_grid=48,
                                           bp_scene_size_m=400.0),
            video=cfg.VideoConfig(duration_s=1.0, fps=5.0, cpi_s=0.4),
        )

    def test_frames_form_and_track_mover(self):
        sc = self._reduced()
        out = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           heading_deg=90.0, speed_mps=30.0,
                           algorithm="mbp", frames_per_batch=2)
        assert out.images.shape[0] == out.schedule.num_frames >= 3
        # mBP keeps the mover focused: strong peak in every frame
        for f in range(out.images.shape[0]):
            img = np.abs(out.images[f])
            assert img.max() / (img.mean() + 1e-30) > 50.0

    def test_fast_pallas_backend_falls_back(self):
        # off-TPU (and for plans the kernel doesn't support),
        # bp_backend='fast_pallas' must quietly use the XLA fast path
        sc = self._reduced()
        out = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           heading_deg=90.0, speed_mps=30.0,
                           algorithm="mbp", frames_per_batch=2,
                           bp_backend="fast_pallas")
        img = np.abs(out.images[0])
        assert img.max() / (img.mean() + 1e-30) > 50.0

    def test_fast_factor_backend_focuses(self):
        # the round-3 production path from the model surface: off-TPU it
        # resolves to the XLA factorized accumulate (or plain fast when the
        # plan bounds refuse a sub-aperture)
        sc = self._reduced()
        out = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           heading_deg=90.0, speed_mps=30.0,
                           algorithm="mbp", frames_per_batch=2,
                           bp_backend="fast_factor")
        img = np.abs(out.images[0])
        assert img.max() / (img.mean() + 1e-30) > 50.0

    def test_mbp_beats_stdbp_for_mover(self):
        sc = self._reduced()
        # heading 45 gives a radial component: in StdBP the mover displaces
        # azimuthally by v_r*R/V (~500 m — off the 400 m grid entirely), while
        # mBP tracks it; this is the reference's Destroyer demo physics.
        common = dict(heading_deg=45.0, speed_mps=15.0, frames_per_batch=2,
                      num_frames=2)
        mbp = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           algorithm="mbp", **common)
        std = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           algorithm="stdbp", **common)
        pk_m = np.abs(mbp.images[0]).max()
        pk_s = np.abs(std.images[0]).max()
        assert pk_m > 3.0 * pk_s

    def test_stream_spectra_matches_per_frame_path(self):
        """stream_spectra=True (cached forward spectra shared across the
        overlapped CPIs, per-segment noise) must match the per-frame path
        under identical per-segment noise — the recentre kernel's f32
        class vs the XLA recentre. Needs a window long enough for the FFT
        kernel (nfft >= 16384)."""
        sc = cfg.videosar()
        sc = sc.replace(
            radar=dataclasses.replace(sc.radar, bandwidth_hz=120e6,
                                      pulse_width_s=2e-6, fs_hz=150e6,
                                      prf_hz=1000.0),
            collect=dataclasses.replace(sc.collect,
                                        window_length_s=9000 / 150e6),
            processing=dataclasses.replace(sc.processing, bp_grid=32,
                                           bp_scene_size_m=400.0),
            video=cfg.VideoConfig(duration_s=1.0, fps=5.0, cpi_s=0.4),
        )
        import jax
        key = jax.random.PRNGKey(3)
        common = dict(heading_deg=90.0, speed_mps=30.0, algorithm="mbp",
                      frames_per_batch=2, bp_backend="fast_factor",
                      key=key, noise_mode="per_segment")
        want = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                            **common)
        got = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           stream_spectra=True, **common)
        assert got.images.shape == want.images.shape
        err = (np.abs(got.images - want.images).max()
               / np.abs(want.images).max())
        assert err < 2e-3, err

    def test_stream_spectra_ring_matches_concat(self):
        """stream_spectra='ring' (device-resident ring window advanced by
        dynamic_update_slice) must reproduce the concat streaming path.
        On TPU the two measure exactly equal; CPU interpret differs at the
        FMA-fusion class of the wide scalar layout (see test_bp_fast)."""
        sc = cfg.videosar()
        sc = sc.replace(
            radar=dataclasses.replace(sc.radar, bandwidth_hz=120e6,
                                      pulse_width_s=2e-6, fs_hz=150e6,
                                      prf_hz=1000.0),
            collect=dataclasses.replace(sc.collect,
                                        window_length_s=9000 / 150e6),
            processing=dataclasses.replace(sc.processing, bp_grid=32,
                                           bp_scene_size_m=400.0),
            video=cfg.VideoConfig(duration_s=1.0, fps=5.0, cpi_s=0.4),
        )
        import jax
        key = jax.random.PRNGKey(3)
        common = dict(heading_deg=90.0, speed_mps=30.0, algorithm="mbp",
                      frames_per_batch=2, bp_backend="fast_factor",
                      key=key, noise_mode="per_segment")
        want = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                            stream_spectra=True, **common)
        got = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                           stream_spectra="ring", **common)
        assert got.images.shape == want.images.shape
        err = (np.abs(got.images - want.images).max()
               / np.abs(want.images).max())
        assert err < 1e-4, err
        # non-contiguous frames cannot ring-stream
        with pytest.raises(ValueError, match="contiguous"):
            videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                         stream_spectra="ring", frame_indices=[0, 2],
                         **common)

    def test_stream_spectra_rejects_per_frame_noise(self):
        sc = self._reduced()
        with pytest.raises(ValueError, match="per.segment"):
            videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 50.0),
                         algorithm="mbp", bp_backend="fast_factor",
                         key=__import__("jax").random.PRNGKey(0),
                         stream_spectra=True)

    def test_schedule_windows(self):
        from nis_sar_amtigmti_video_tpu.video import scheduler
        sched = scheduler.make_schedule(cfg.VideoConfig(), 5000.0)
        # (25000-2500)/500 + 1 = 46 frames fit (the reference requests 50 and
        # breaks out at the same bound, sar_batch_sim.py:303-306)
        assert sched.num_frames == 46
        assert sched.cpi_pulses == 2500 and sched.step_pulses == 500
        assert sched.starts[-1] + sched.cpi_pulses <= sched.total_pulses


class TestVideoSarSegmentCache:
    def test_cached_segments_equal_direct_cpi(self):
        """Frames assembled from cached step segments must be identical to
        simulating each overlapped CPI directly (noise off)."""
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.geometry import orbit
        from nis_sar_amtigmti_video_tpu.models.videosar import (
            spotlight_echo_opts, antenna_length_for_swath)
        from nis_sar_amtigmti_video_tpu.ops.echo import (phase_history,
                                                         window_start_time)
        from nis_sar_amtigmti_video_tpu.video import scheduler
        from nis_sar_amtigmti_video_tpu.models import videosar

        sc = cfg.videosar().replace(
            radar=dataclasses.replace(cfg.videosar().radar,
                                      bandwidth_hz=120e6, pulse_width_s=2e-6,
                                      fs_hz=150e6, prf_hz=1000.0),
            collect=dataclasses.replace(cfg.videosar().collect,
                                        window_length_s=512 / 150e6),
            processing=dataclasses.replace(cfg.videosar().processing,
                                           bp_grid=32, bp_scene_size_m=400.0),
            video=cfg.VideoConfig(duration_s=1.0, fps=5.0, cpi_s=0.4))
        out = videosar.run(sc, T.point_target((5.0, -3.0, 0.0), 10.0),
                           heading_deg=30.0, speed_mps=8.0, algorithm="stdbp",
                           frames_per_batch=2, bp_backend="exact")
        # direct per-frame resimulation for comparison at the raw level
        g, r = sc.geometry, sc.radar
        sched = scheduler.make_schedule(sc.video, r.prf_hz)
        times = np.linspace(-sc.video.duration_s / 2, sc.video.duration_s / 2,
                            sched.total_pulses)
        traj = orbit.make_trajectory(g, times)
        tgt = T.point_target((5.0, -3.0, 0.0), 10.0).rotate_z(30.0)
        phi = np.radians(30.0)
        vel = np.array([8.0 * np.cos(phi), 8.0 * np.sin(phi), 0.0])
        l_ant = antenna_length_for_swath(sc, 400.0)
        opts = spotlight_echo_opts(sc, l_ant)
        from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
        from nis_sar_amtigmti_video_tpu.models.videosar import (bp_params_for,
                                                                form_frames_bp)
        t0 = videosar.window_start_time(g.slant_range_m, opts,
                                        sc.collect.window_length_s, "centered")
        p_bp = bp_params_for(sc, opts, "f32")
        import jax
        imgs = []
        for f in range(sched.num_frames):
            i0 = int(sched.starts[f])
            sl = traj.slice(i0, i0 + sched.cpi_pulses)
            raw = phase_history(sl, tgt, opts, t_start=t0,
                                target_velocity=vel)
            img = form_frames_bp(raw[None], jnp.asarray(sl.positions)[None],
                                 jnp.asarray(sl.velocities)[None],
                                 jnp.asarray(sl.times)[None],
                                 jnp.zeros(3), jnp.float64(t0), p_bp)
            imgs.append(cplx.to_host(img)[0])
        want = np.stack(imgs)
        np.testing.assert_allclose(np.abs(out.images), np.abs(want),
                                   rtol=0, atol=1e-4 * np.abs(want).max())


class TestVideoSarResume:
    def test_resume_fills_missing_frames(self, tmp_path):
        """Fault injection: delete frames from a checkpointed run; resume()
        re-forms exactly those, reproducing the original stack bit-close."""
        from nis_sar_amtigmti_video_tpu.io import products
        sc = cfg.videosar().replace(
            radar=dataclasses.replace(cfg.videosar().radar,
                                      bandwidth_hz=120e6, pulse_width_s=2e-6,
                                      fs_hz=150e6, prf_hz=1000.0),
            collect=dataclasses.replace(cfg.videosar().collect,
                                        window_length_s=512 / 150e6),
            processing=dataclasses.replace(cfg.videosar().processing,
                                           bp_grid=32, bp_scene_size_m=400.0),
            video=cfg.VideoConfig(duration_s=1.0, fps=5.0, cpi_s=0.4))
        kw = dict(heading_deg=0.0, speed_mps=10.0, algorithm="stdbp",
                  frames_per_batch=2, key=jax.random.PRNGKey(7))
        full = videosar.run(sc, T.point_target((0.0, 0.0, 0.0), 20.0), **kw)
        d = str(tmp_path / "frames")
        products.write_video_frames(d, full.images)
        import os
        os.remove(os.path.join(d, "frame_00001.npy"))
        os.remove(os.path.join(d, "frame_00002.npy"))
        recovered = videosar.resume(sc, T.point_target((0.0, 0.0, 0.0), 20.0),
                                    d, **kw)
        assert recovered == [1, 2]
        idx, back = products.read_video_frames(d)
        assert idx.tolist() == list(range(full.images.shape[0]))
        # deterministic keys: recovered frames match the originals
        np.testing.assert_allclose(back, full.images, rtol=0,
                                   atol=1e-5 * np.abs(full.images).max())


class TestSchedulerGather:
    def test_gather_frames_device(self):
        """gather_frames produces the exact overlapped (F, cpi, ...) stack."""
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.video import scheduler
        sched = scheduler.FrameSchedule(
            starts=np.array([0, 2, 4]), cpi_pulses=4, step_pulses=2,
            total_pulses=8)
        stream = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
        frames = np.asarray(scheduler.gather_frames(stream, sched))
        assert frames.shape == (3, 4, 3)
        np.testing.assert_allclose(frames[1], np.asarray(stream)[2:6])
        np.testing.assert_allclose(frames[2], np.asarray(stream)[4:8])
