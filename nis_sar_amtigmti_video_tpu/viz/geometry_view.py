"""Collect-geometry rendering: orbit arc, look vector, beam footprint.

The reference viewers each draw a 3-D geometry panel — flat-earth beam cone
(sar_interactive_viewer.py:50-154), curved-earth orbit view
(sar_satellite_viewer.py:49-119), ship velocity vector
(sar_satellite_moving_viewer.py). This renders the same picture headlessly
from a ScenarioConfig + trajectory.
"""

from __future__ import annotations

import numpy as np


def save_geometry_view(path: str, sc, trajectory=None,
                       target_velocity=None, scene_extent_m: float = 500.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from nis_sar_amtigmti_video_tpu.geometry import orbit as orbit_mod

    g = sc.geometry
    if trajectory is None:
        n = sc.collect.num_pulses(sc.radar.prf_hz)
        trajectory = orbit_mod.make_trajectory(
            g, orbit_mod.slow_time_grid(sc.collect.integration_time_s, n))

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")

    p = trajectory.positions / 1e3
    ax.plot(p[:, 0], p[:, 1], p[:, 2], "b-", lw=2, label="platform track")
    mid = p[p.shape[0] // 2]
    ax.scatter(*mid, color="b", s=60)

    # beam cone from aperture center to the scene
    ax.plot([mid[0], 0], [mid[1], 0], [mid[2], 0], "y-", lw=1,
            label="boresight")
    th = np.linspace(0, 2 * np.pi, 33)
    ex = scene_extent_m / 1e3
    ax.plot(ex * np.cos(th), ex * np.sin(th), np.zeros_like(th), "g-",
            label="scene")

    if g.platform == "orbit":
        # local earth-surface patch (curved)
        re = g.earth_radius_m
        u = np.linspace(-0.15, 0.15, 24)
        gx, gy = np.meshgrid(u, u)
        zz = (np.sqrt(np.maximum(re ** 2 - (gx * re) ** 2 - (gy * re) ** 2,
                                 0.0)) - re) / 1e3
        ax.plot_surface(gx * re / 1e3, gy * re / 1e3, zz, alpha=0.15,
                        color="c", linewidth=0)

    if target_velocity is not None:
        v = np.asarray(target_velocity)
        if np.linalg.norm(v) > 0:
            v = v / np.linalg.norm(v) * scene_extent_m / 1e3
            ax.quiver(0, 0, 0, v[0], v[1], v[2], color="r", lw=2,
                      label="target velocity")

    ax.set_xlabel("x (km)")
    ax.set_ylabel("y (km)")
    ax.set_zlabel("z (km)")
    ax.legend(loc="upper left")
    ax.set_title(f"{sc.name}: R0={g.slant_range_m/1e3:.1f} km, "
                 f"look {g.look_angle_deg:.0f}°, "
                 f"inc {np.degrees(g.incidence_angle_rad):.1f}°")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
