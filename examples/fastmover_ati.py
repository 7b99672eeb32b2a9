"""Fast-mover ATI phase sweep — the physics of ``fastmover.html``.

Sweeps target radial speed and plots the measured ATI phase at the mover
pixel against the prediction phi = 2*pi*B*v_r/(lambda*V), showing the wrap at
the unambiguous velocity v_amb = lambda*V/(2B) (the demo's speed slider).

Run: python examples/fastmover_ati.py [--out fastmover_ati.png]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fastmover_ati.png")
    ap.add_argument("--speeds", type=int, default=9)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.gmti import velocity
    from nis_sar_amtigmti_video_tpu.models import gmti as gmti_model
    from nis_sar_amtigmti_video_tpu.scene import targets as T
    from nis_sar_amtigmti_video_tpu.utils import cplx

    sc = cfg.ati_dpca()
    sc = sc.replace(
        radar=dataclasses.replace(sc.radar, bandwidth_hz=300e6,
                                  pulse_width_s=2e-6, fs_hz=150e6),
        collect=dataclasses.replace(sc.collect, integration_time_s=192 / 6000.0,
                                    window_length_s=512 / 150e6))
    g, r = sc.geometry, sc.radar
    # phase-center progression speed (V_sat) sets the ATI lag, not V_eff
    v_plat = g.orbital_velocity_mps
    v_amb = velocity.ambiguous_velocity(r.wavelength_m, v_plat,
                                        sc.channels.baseline_m)
    print(f"v_amb = {v_amb:.2f} m/s")

    speeds = np.linspace(-0.6 * v_amb, 0.6 * v_amb, args.speeds)
    got, want = [], []
    for v in speeds:
        # ground speed vx s.t. closing velocity = -vx*sin(inc) equals -v
        vx = v / np.sin(g.incidence_angle_rad)
        prod = gmti_model.run(sc, T.point_target((0, 0, 0), 1e4),
                              (vx, 0.0, 0.0), balance=False)
        s1 = np.abs(cplx.to_host(prod.slc1))
        ph = cplx.to_host(prod.ati_phase)
        iy, ix = np.unravel_index(s1.argmax(), s1.shape)
        got.append(ph[iy, ix])
        w = velocity.phase_from_velocity(-v, r.wavelength_m, v_plat,
                                         sc.channels.baseline_m)
        want.append(np.angle(np.exp(1j * w)))
        print(f"  v_r={-v:+6.2f} m/s  phase got={got[-1]:+.3f} want={want[-1]:+.3f}")

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(-speeds, want, "k--", label="2π B v_r/(λ V), wrapped")
    ax.plot(-speeds, got, "o", label="measured at mover pixel")
    ax.axhline(np.pi, color="r", ls=":", lw=1)
    ax.axhline(-np.pi, color="r", ls=":", lw=1)
    ax.set_xlabel("closing velocity v_r (m/s)")
    ax.set_ylabel("ATI phase (rad)")
    ax.set_title(f"ATI phase vs radial velocity (v_amb={v_amb:.1f} m/s)")
    ax.legend()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
