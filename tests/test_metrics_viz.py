"""Metrics (IRF/PSLR/ISLR), viz stats helpers, determinism of keyed noise."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import noise as noise_ops
from nis_sar_amtigmti_video_tpu.utils import metrics
from nis_sar_amtigmti_video_tpu.viz import render, scan_demo
from nis_sar_amtigmti_video_tpu.utils import cplx


class TestImpulseResponse:
    def test_sinc_metrics(self):
        """An ideal sinc has -13.26 dB PSLR and ~0.886/T resolution."""
        n = 4096
        x = (np.arange(n) - n / 2) / 16.0       # 16 cells per sinc null
        prof = np.abs(np.sinc(x))
        irf = metrics.impulse_response(prof, cell_size_m=0.5)
        assert irf.pslr_db == pytest.approx(-13.26, abs=0.15)
        # -3 dB width of sinc = 0.886 * null-width/... = 0.886*16 cells
        assert irf.resolution_cells == pytest.approx(0.886 * 16, rel=0.03)
        assert irf.resolution_m == pytest.approx(0.886 * 16 * 0.5, rel=0.03)
        assert irf.peak_index == n // 2

    def test_expected_resolutions(self):
        assert metrics.expected_range_resolution(500e6) == pytest.approx(
            0.2998, abs=1e-3)
        assert metrics.expected_azimuth_resolution(0.031, 500e3, 1000.0) \
            == pytest.approx(7.75, abs=0.01)

    def test_budget_report_keys(self):
        rep = metrics.radar_budget_report(cfg.satellite_stripmap())
        for k in ("slant_range_km", "antenna_gain_db", "range_resolution_m"):
            assert k in rep


class TestVizHelpers:
    def test_region_stats_cancellation(self):
        s1 = np.full((10, 10), 2.0)
        d = np.full((10, 10), 0.02)
        st = render.region_stats(s1, d)
        assert st["cancellation_db"] == pytest.approx(40.0)
        assert st["pixels"] == 100

    def test_masked_phase(self):
        s1 = np.ones((4, 4), complex)
        s1[0, 0] = 100.0
        s2 = s1 * np.exp(-1j * 0.5)
        ph = render.masked_phase_display(s1, s2, threshold=0.5)
        assert ph[0, 0] == pytest.approx(0.5)
        assert ph[1, 1] == 0.0  # masked

    def test_scan_frames(self):
        img = np.random.rand(32, 48)
        fr = scan_demo.scan_frames(img, num_frames=5, block=8)
        assert fr.shape == (5, 32, 48, 3) and fr.dtype == np.uint8
        # final frame fully resolved (left region equals original)
        np.testing.assert_allclose(fr[-1][:, :20, 0] / 255.0,
                                   img[:, :20], atol=0.05)


class TestDeterminism:
    def test_noise_reproducible(self):
        key = jax.random.PRNGKey(42)
        raw = jnp.zeros((32, 32), jnp.complex64)
        a = cplx.to_host(noise_ops.add_ocean_noise(key, raw, 10.0, ref_power=1.0))
        b = cplx.to_host(noise_ops.add_ocean_noise(key, raw, 10.0, ref_power=1.0))
        np.testing.assert_array_equal(a, b)
        c = cplx.to_host(noise_ops.add_ocean_noise(
            jax.random.PRNGKey(43), raw, 10.0, ref_power=1.0))
        assert not np.allclose(a, c)


class TestRunLog:
    def test_jsonl_events(self, tmp_path):
        import json
        from nis_sar_amtigmti_video_tpu import config as cfg
        from nis_sar_amtigmti_video_tpu.utils.runlog import RunLogger
        from nis_sar_amtigmti_video_tpu.utils.profiling import StageTimer
        p = tmp_path / "run.jsonl"
        st = StageTimer()
        with st.stage("focus"):
            pass
        with RunLogger(str(p), run_id="t") as rl:
            rl.params(cfg.satellite_stripmap())
            rl.timings(st)
            rl.event("custom", value=np.float32(1.5), arr=np.arange(3))
        lines = [json.loads(l) for l in open(p)]
        kinds = [l["event"] for l in lines]
        assert kinds == ["params", "timings", "custom"]
        assert lines[0]["slant_range_km"] > 500
        assert "focus" in lines[1]["stages"]
        assert lines[2]["value"] == 1.5 and lines[2]["arr"] == [0, 1, 2]


class TestFormationQuality:
    def test_rda_hamming_sidelobes(self):
        """Hamming-weighted RDA: range PSLR well below the -13 dB unweighted
        sinc level (theory -42.7 dB; finite grids land in the -25..-42 range),
        and the -3 dB width within the tapered-resolution budget."""
        import dataclasses
        from nis_sar_amtigmti_video_tpu import config as cfg
        from nis_sar_amtigmti_video_tpu.models import stripmap
        from nis_sar_amtigmti_video_tpu.scene import targets as T
        from nis_sar_amtigmti_video_tpu.utils import metrics

        sc = cfg.satellite_stripmap().replace(
            radar=dataclasses.replace(cfg.satellite_stripmap().radar,
                                      bandwidth_hz=120e6, pulse_width_s=2e-6,
                                      fs_hz=150e6),
            collect=dataclasses.replace(cfg.satellite_stripmap().collect,
                                        integration_time_s=192 / 6000.0,
                                        window_length_s=768 / 150e6))
        prod = stripmap.run(sc, T.point_target((0.0, 0.0, 0.0), 100.0))
        img = np.abs(cplx.to_host(prod.image))
        ia, ir = np.unravel_index(img.argmax(), img.shape)
        rng_cut = img[ia, :]
        irf = metrics.impulse_response(rng_cut,
                                       cell_size_m=299792458.0 / (2 * 150e6))
        assert irf.pslr_db < -22.0
        # Hamming broadening ~1.3x of c/2B
        expect = metrics.expected_range_resolution(120e6, 1.3)
        assert irf.resolution_m < 1.6 * expect


class TestDebugSanitizers:
    def test_nan_checks_traps_and_restores(self):
        import jax
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.utils.debug import nan_checks
        with pytest.raises(FloatingPointError):
            with nan_checks():
                jnp.log(jnp.array(-1.0)).block_until_ready()
        assert not jax.config.jax_debug_nans   # restored
        # clean computation passes inside the scope
        with nan_checks():
            assert float(jnp.log(jnp.array(2.0))) > 0

    def test_assert_finite(self):
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.utils.debug import assert_finite
        assert_finite({"a": jnp.ones(3), "b": jnp.ones(2, jnp.complex64)})
        with pytest.raises(FloatingPointError, match="stage"):
            assert_finite([jnp.array([1.0, jnp.nan])], where="stage")
