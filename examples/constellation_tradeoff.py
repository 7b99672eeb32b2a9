"""Constellation size vs revisit tradeoff — the VideoSAR/distributed-spotlight
designers (``VideoSAR constellation.html``, ``distributed spotlight mode.html``)
as a quantitative sweep: mean revisit and coverage fraction vs number of
satellites, spotlight vs HRWS access geometry.

Run: python examples/constellation_tradeoff.py [--out constellation.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="constellation.png")
    ap.add_argument("--duration", type=float, default=12000.0)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from nis_sar_amtigmti_video_tpu.mission import coverage

    counts = [4, 8, 16, 32, 64, 128, 256]
    rows = {}
    for mode in ("spotlight", "hrws"):
        cov, rev = [], []
        for n in counts:
            cfg = coverage.ConstellationConfig(num_sats=n, altitude_m=550e3)
            s = coverage.analyze(cfg, duration_s=args.duration, dt_s=20.0,
                                 mode=mode)
            cov.append(100 * s.coverage_fraction)
            rev.append(s.mean_revisit_s / 60.0)
            print(f"{mode:10s} N={n:4d}: coverage {cov[-1]:5.1f}%  "
                  f"mean revisit {rev[-1]:6.1f} min")
        rows[mode] = (cov, rev)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    for mode, (cov, rev) in rows.items():
        ax1.semilogx(counts, cov, "o-", label=mode)
        ax2.loglog(counts, np.maximum(rev, 1e-2), "o-", label=mode)
    ax1.set_xlabel("satellites")
    ax1.set_ylabel("coverage (%)")
    ax1.set_title("Target coverage fraction")
    ax1.legend()
    ax2.set_xlabel("satellites")
    ax2.set_ylabel("mean revisit (min)")
    ax2.set_title("Mean revisit gap")
    ax2.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
