"""Distributed model API: sharded pipeline equals the single-device one."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.gmti import ati, cfar, dpca
from nis_sar_amtigmti_video_tpu.models import distributed
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.parallel import mesh as mesh_mod
from nis_sar_amtigmti_video_tpu.utils import cplx

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _params(n_az, n_rg):
    g = cfg.ati_dpca().geometry
    return csa_ops.CsaParams(
        wavelength_m=cfg.ati_dpca().radar.wavelength_m,
        chirp_rate=150e6 / 2e-6, fs_hz=150e6, prf_hz=6000.0,
        velocity_mps=g.effective_velocity_mps, range_ref_m=g.slant_range_m,
        t_start_fast=2 * g.slant_range_m / 299792458.0,
        num_pulses=n_az, num_samples=n_rg)


@needs_8
class TestShardedGmti:
    def test_matches_single_device(self):
        n_az, n_rg, n_f = 32, 64, 4
        p = _params(n_az, n_rg)
        key = jax.random.PRNGKey(0)
        raw = jax.lax.complex(
            jax.random.normal(key, (n_f, 2, n_az, n_rg), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (n_f, 2, n_az, n_rg), jnp.float32))

        mesh = mesh_mod.make_mesh((2, 2, 2))
        step = distributed.make_gmti_step(mesh, p)
        out = step(jax.device_put(raw, distributed.raw_sharding(mesh)))

        # single-device reference with matching (global-mean) balance
        phases = csa_ops.csa_phases(p)
        slc = csa_ops.apply_csa(raw, phases)
        s1, s2 = slc[:, 0], slc[:, 1]
        ifg = s1 * jnp.conj(s2)
        m = jnp.sum(ifg)
        cal = m / jnp.abs(m)
        s2b = s2 * cal
        diff = s1 - s2b
        want_dpca = np.abs(cplx.to_host(diff))
        got_dpca = cplx.to_host(out.dpca_mag)
        np.testing.assert_allclose(got_dpca, want_dpca, rtol=0,
                                   atol=3e-4 * want_dpca.max())

        mag1 = np.abs(cplx.to_host(s1))
        want_phase = np.where(mag1 > 0.05 * mag1.max(),
                              np.angle(cplx.to_host(ifg * jnp.conj(cal))), 0.0)
        got_phase = cplx.to_host(out.ati_phase)
        strong = mag1 > 0.1 * mag1.max()
        np.testing.assert_allclose(got_phase[strong], want_phase[strong],
                                   atol=2e-3)
        assert np.isfinite(float(np.asarray(out.cancellation)))

    def test_videosar_step(self):
        n_az, n_rg, n_f = 32, 64, 8
        p = _params(n_az, n_rg)
        key = jax.random.PRNGKey(3)
        raw = jax.lax.complex(
            jax.random.normal(key, (n_f, n_az, n_rg), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 2),
                              (n_f, n_az, n_rg), jnp.float32))
        mesh = mesh_mod.make_mesh((4, 1, 2))
        step = distributed.make_videosar_step(mesh, p)
        got = cplx.to_host(step(raw))
        want = cplx.to_host(csa_ops.apply_csa(raw, csa_ops.csa_phases(p)))
        np.testing.assert_allclose(got, want, rtol=0,
                                   atol=3e-4 * np.abs(want).max())
