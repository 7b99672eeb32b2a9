"""MID-SCALE acceptance: an ungated ~1,800 x 3,328 two-channel run.

Sits between the toy-scale goldens (test_baseline_acceptance.py, 192 x 640)
and the env-gated full-scale run (test_fullscale_acceptance.py,
7,200 x 13,200, ~23 min): a quarter-scale cut of the reference ATI/DPCA
workload (sar_ati_dcpa_sim_csa.py:46-47) that runs in the default suite in
~1-2 min, so a scale-dependent regression (phase error growing with shape —
the round-1 "toy-scale loophole") is caught by CI rather than only by a
manual gated run. Same BASELINE budgets: <0.1 dB intensity, <1e-3 rad ATI
phase at strong pixels, vs the f64 NumPy oracle.
"""

import dataclasses

import numpy as np

import nis_sar_amtigmti_video_tpu as nst  # noqa: F401  (x64 on)
import oracle
from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.models import gmti as gmti_model
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops.echo import fast_time_grid
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.utils import cplx


def test_midscale_two_channel_acceptance():
    sc = cfg.ati_dpca()
    sc = sc.replace(
        radar=dataclasses.replace(sc.radar, bandwidth_hz=300e6,
                                  pulse_width_s=2e-6),
        collect=dataclasses.replace(
            sc.collect,
            integration_time_s=1800 / sc.radar.prf_hz,   # 1,800 pulses
            window_length_s=3328 / sc.radar.fs_hz))      # 3,328 samples
    ship = T.destroyer().rotate_z(90.0)
    vel = np.array([0.0, 4.0, 0.0])

    raw2, traj, t0 = gmti_model.simulate_two_channel(sc, ship, vel)
    assert raw2.shape == (2, 1800, 3328)
    prod = gmti_model.focus_and_products(raw2, sc, t0, balance=False)
    s1f = cplx.to_host(prod.slc1)
    s2f = cplx.to_host(prod.slc2)
    del raw2, prod

    opts = echo_opts_for(sc)
    grid = t0 + fast_time_grid(opts)
    offs = sc.channels.rx_offsets()
    raws = [oracle.echo_bistatic(ship.positions, ship.rcs, traj.positions,
                                 traj.velocities, grid, opts.fc_hz,
                                 opts.chirp_rate, opts.pulse_width_s, off,
                                 vel, traj.times) for off in offs]
    r1, r2 = raws[0][1:, :], raws[1][:-1, :]
    del raws
    g, r = sc.geometry, sc.radar
    s1o = oracle.focus_csa(r1, r.wavelength_m, r.chirp_rate, r.fs_hz,
                           r.prf_hz, g.effective_velocity_mps,
                           g.slant_range_m, t0)[0].T
    del r1
    s2o = oracle.focus_csa(r2, r.wavelength_m, r.chirp_rate, r.fs_hz,
                           r.prf_hz, g.effective_velocity_mps,
                           g.slant_range_m, t0)[0].T
    del r2

    strong = np.abs(s1o) > 0.05 * np.abs(s1o).max()
    ratio_db = 20 * np.log10(np.abs(s1f[strong]) / np.abs(s1o[strong]))
    ati_f = np.angle(s1f * np.conj(s2f))
    ati_o = np.angle(s1o * np.conj(s2o))
    dphi = np.angle(np.exp(1j * (ati_f[strong] - ati_o[strong])))
    print(f"\nmid-scale: strong px {int(strong.sum())}, "
          f"|intensity| max {np.abs(ratio_db).max():.4f} dB, "
          f"|ATI phase| max {np.abs(dphi).max():.2e} rad")
    assert np.abs(ratio_db).max() < 0.1
    assert np.abs(dphi).max() < 1e-3
