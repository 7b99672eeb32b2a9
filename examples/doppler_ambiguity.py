"""Azimuth (Doppler) ambiguity demo — the physics of ``doppler ambiguity.html``.

Two targets imaged at an adequate PRF and at a deliberately sub-Nyquist PRF:
the low-PRF image shows ghost targets from azimuth aliasing; then the same
under-sampled collect with 2 receive channels is repaired by HRWS
reconstruction (models/hrws.py).

Run: python examples/doppler_ambiguity.py [--out doppler_ambiguity.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="doppler_ambiguity.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.geometry import orbit
    from nis_sar_amtigmti_video_tpu.models import hrws
    from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
    from nis_sar_amtigmti_video_tpu.ops.echo import (
        EchoOpts, multi_channel_phase_history, phase_history,
        window_start_time)
    from nis_sar_amtigmti_video_tpu.scene import targets as T
    from nis_sar_amtigmti_video_tpu.utils import cplx

    C = 299792458.0
    g = cfg.satellite_stripmap().geometry
    tgts = T.PointTargets.concatenate([
        T.point_target((0.0, 0.0, 0.0), 100.0),
        T.point_target((120.0, 0.0, 0.0), 100.0)])

    def collect_and_focus(prf, n_p, raw=None):
        traj = orbit.make_trajectory(g, orbit.slow_time_grid(n_p / prf, n_p))
        opts = EchoOpts(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6,
                        pulse_width_s=2e-6, fs_hz=150e6, num_samples=512)
        t0 = window_start_time(g.slant_range_m, opts, 512 / 150e6, "reference")
        if raw is None:
            raw = phase_history(traj, tgts, opts, t_start=t0)
        p = csa_ops.CsaParams(
            wavelength_m=C / 9.65e9, chirp_rate=opts.chirp_rate,
            fs_hz=opts.fs_hz, prf_hz=prf,
            velocity_mps=g.effective_velocity_mps,
            range_ref_m=g.slant_range_m, t_start_fast=t0,
            num_pulses=int(raw.shape[0]), num_samples=512)
        return np.abs(cplx.to_host(csa_ops.focus_csa(raw, p))), traj, opts, t0

    # Aperture long enough that the Doppler sweep Ka*T/2 (~7.1 kHz/s * T/2)
    # exceeds the low PRF's Nyquist — that is what creates azimuth ghosts.
    t_int = 0.34
    img_hi, _, opts, t0 = collect_and_focus(6000.0, int(0.34 * 6000))

    # sub-Nyquist: same integration time at PRF/4 -> ghosts
    img_lo, traj_lo, _, _ = collect_and_focus(1500.0, int(0.34 * 1500))

    # 2-channel HRWS repair of a PRF/2 collect at the uniform-sampling spacing
    prf2 = 3000.0
    n_p2 = int(0.34 * prf2)
    traj2 = orbit.make_trajectory(g, orbit.slow_time_grid(n_p2 / prf2, n_p2))
    spacing = hrws.uniform_sampling_spacing(g.orbital_velocity_mps, prf2, 2)
    offs = (np.arange(2) - 0.5) * spacing
    raw2 = multi_channel_phase_history(traj2, tgts, opts, t_start=t0,
                                       rx_offsets=offs)
    hp = hrws.HrwsParams(num_channels=2, spacing_m=spacing,
                         prf_hz=prf2, velocity_mps=g.orbital_velocity_mps)
    rec = hrws.reconstruct(raw2, hp)
    p_rec = csa_ops.CsaParams(
        wavelength_m=C / 9.65e9, chirp_rate=opts.chirp_rate, fs_hz=opts.fs_hz,
        prf_hz=hp.effective_prf, velocity_mps=g.effective_velocity_mps,
        range_ref_m=g.slant_range_m, t_start_fast=t0,
        num_pulses=2 * n_p2, num_samples=512)
    img_rec = np.abs(cplx.to_host(csa_ops.focus_csa(rec, p_rec)))

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    for ax, (img, title) in zip(axes, [
            (img_hi, "PRF 6 kHz — clean"),
            (img_lo, "PRF 1.5 kHz — azimuth ghosts"),
            (img_rec, "PRF 3 kHz x 2 channels — HRWS reconstructed")]):
        d = 20 * np.log10(img + 1e-9)
        vmax = np.percentile(d, 99.9)
        ax.imshow(d, aspect="auto", origin="lower", cmap="gray",
                  vmin=vmax - 35, vmax=vmax)
        ax.set_title(title)
        ax.set_xlabel("range bins")
        ax.set_ylabel("azimuth bins")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
