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


class TestPallasCsaKernel:
    def _params(self, size):
        from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
        from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
        sc = cfg.videosar()
        g, r = sc.geometry, sc.radar
        t0 = window_start_time(g.slant_range_m, None,
                               sc.collect.window_length_s, "centered")
        return csa_ops.CsaParams(
            wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate,
            fs_hz=r.fs_hz, prf_hz=r.prf_hz,
            velocity_mps=g.effective_velocity_mps,
            range_ref_m=g.slant_range_m, t_start_fast=t0,
            num_pulses=size, num_samples=size)

    def test_matches_fused_xla(self):
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
        from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel
        p = self._params(256)
        f = csa_ops.csa_factors(p)
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((256, 256))
             + 1j * rng.standard_normal((256, 256))).astype(np.complex64)
        want = np.asarray(csa_ops.apply_csa_fused(jnp.asarray(x), f, "xla"))
        got = np.asarray(csa_kernel.apply_csa_pallas(jnp.asarray(x), f,
                                                     interpret=True))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 2e-3

    @pytest.mark.parametrize("kw", [dict(k2_variant="dots"),
                                    dict(lead_variant="dots"),
                                    dict(k2_variant="dots",
                                         lead_variant="dots")])
    def test_transpose_free_variants_match(self, kw):
        """The restack-free K2 digit swap and the transpose-free K1/K3
        second digit contraction must reproduce the canonical kernels
        bit-closely (same contractions, different pass grouping — f32
        rounding only)."""
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
        from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel
        p = self._params(256)
        f = csa_ops.csa_factors(p)
        rng = np.random.default_rng(7)
        xr = rng.standard_normal((256, 256)).astype(np.float32)
        xi = rng.standard_normal((256, 256)).astype(np.float32)
        want = csa_kernel.apply_csa_pallas_planes(
            jnp.asarray(xr), jnp.asarray(xi), f, interpret=True)
        got = csa_kernel.apply_csa_pallas_planes(
            jnp.asarray(xr), jnp.asarray(xi), f, interpret=True, **kw)
        for w, g in zip(want, got):
            scale = np.abs(np.asarray(w)).max()
            assert np.abs(np.asarray(g) - np.asarray(w)).max() / scale < 1e-5

    def test_batched(self):
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
        from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel
        p = self._params(256)
        f = csa_ops.csa_factors(p)
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((2, 256, 256))
             + 1j * rng.standard_normal((2, 256, 256))).astype(np.complex64)
        want = np.asarray(csa_ops.apply_csa_fused(jnp.asarray(x), f, "xla"))
        got = np.asarray(csa_kernel.apply_csa_pallas(jnp.asarray(x), f,
                                                     interpret=True))
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-3

    def test_unsupported_shape_raises(self):
        import jax.numpy as jnp
        from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
        from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel
        p = self._params(192)   # 192 is not a perfect square
        f = csa_ops.csa_factors(p)
        x = jnp.zeros((192, 192), jnp.complex64)
        with pytest.raises(ValueError, match="square-factorable"):
            csa_kernel.apply_csa_pallas(x, f, interpret=True)
