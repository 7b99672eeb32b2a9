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
