"""Dual-baseline CRT velocity-ambiguity solver — ``CRT Solver.html`` as code.

Reproduces the demo's constants (lambda=0.03, v_amb=7600, R1=0.2 m, R2=5.0 m,
measured phases -2.503185 / 0.276) and renders the |v1-v2| hypothesis heatmap
plus the ranked candidate table.

Run: python examples/crt_dual_baseline.py [--out crt_solver.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="crt_solver.png")
    ap.add_argument("--k-range", type=int, default=20)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from nis_sar_amtigmti_video_tpu.gmti import crt

    lam, v_amb, r1, r2 = 0.03, 7600.0, 0.2, 5.0
    p1, p2 = -2.503185, 0.276
    sol = crt.solve(p1, p2, lam, v_amb, r1, r2, k_range=args.k_range)
    vels, residuals, k1s, k2s = crt.top_candidates(
        sol, p1, p2, lam, v_amb, r1, r2, n=10)

    print(f"best: v_r = {float(sol.velocity):+.3f} m/s "
          f"(k1={int(sol.k1)}, k2={int(sol.k2)}, residual {float(sol.residual):.4f})")
    print(" rank |   v_r (m/s) | residual |  k1 |  k2")
    for i in range(10):
        print(f"  {i+1:3d} | {float(vels[i]):+10.3f} | {float(residuals[i]):8.4f} "
              f"| {int(k1s[i]):3d} | {int(k2s[i]):3d}")

    fig, ax = plt.subplots(figsize=(7, 6))
    grid = np.asarray(sol.diff_grid)
    k = args.k_range
    im = ax.imshow(np.log10(grid + 1e-6), origin="lower",
                   extent=[-k, k, -k, k], cmap="viridis")
    ax.plot(int(sol.k2), int(sol.k1), "r*", ms=16, label="best (k1,k2)")
    ax.set_xlabel("k2 (long-baseline wraps)")
    ax.set_ylabel("k1 (short-baseline wraps)")
    ax.set_title("log10 |v1 - v2| hypothesis surface")
    fig.colorbar(im, ax=ax)
    ax.legend()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
