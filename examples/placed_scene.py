"""Fetched real-world scene with the reference's six model placements,
end to end: terrain + OSM features -> world meshes (with the placed
vehicles rendered at their poses) -> point-target bridge -> phase history
-> focused image.

Reproduces the scene the reference assembles across sar_scene_data.py
(MATERIALS :9-69, SCENE_MODELS :73-128) and sar_simulator_ursina.py
(:247-266) — but carried all the way into the radar simulation, which the
reference only renders visually.

Offline by construction (zero-egress environments): the OSM features and
elevation grid are the recorded-payload shapes the fetch path parses.

Run: python examples/placed_scene.py [--outdir .]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_fetch_payloads():
    """An Overpass-format response + elevation grid for a coastal strip:
    water to the north (the boat/frigate placements), a road and buildings
    to the south (car/tank), open apron for the aircraft."""
    def ring(cx, cy, w, h):
        p = [(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
             (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2),
             (cx - w / 2, cy - h / 2)]
        return [{"lat": y / 111320.0, "lon": x / 111320.0} for x, y in p]

    osm = {"elements": [
        {"type": "way", "tags": {"building": "yes", "height": "12"},
         "geometry": ring(-60.0, 150.0, 40.0, 30.0)},
        {"type": "way", "tags": {"building": "yes"},
         "geometry": ring(110.0, 180.0, 30.0, 30.0)},
        {"type": "way", "tags": {"highway": "service"},
         "geometry": [{"lat": y / 111320.0, "lon": x / 111320.0}
                      for x, y in [(-150.0, 120.0), (40.0, 210.0),
                                   (150.0, 260.0)]]},
        {"type": "way", "tags": {"natural": "water"},
         "geometry": ring(0.0, 520.0, 700.0, 400.0)},
        {"type": "way", "tags": {"landuse": "grass"},
         "geometry": ring(0.0, 100.0, 500.0, 250.0)},
    ]}
    n = 16
    yy, xx = np.mgrid[0:n, 0:n]
    elev = 4.0 * np.clip(1.0 - yy / (n - 1) * 1.6, 0.0, None)  # shore slope
    return osm, elev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--pulses", type=int, default=256)
    args = ap.parse_args()

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.geometry import orbit
    from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
    from nis_sar_amtigmti_video_tpu.ops import bp_fast
    from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts, phase_history,
                                                     window_start_time)
    from nis_sar_amtigmti_video_tpu.scene import targets as T
    from nis_sar_amtigmti_video_tpu.scene.materials import (
        SceneFetcher, features_to_point_targets, placement_targets)
    from nis_sar_amtigmti_video_tpu.utils import cplx
    from nis_sar_amtigmti_video_tpu.viz import world

    # --- fetch (recorded payloads) + placements ---
    osm, elev_grid = synthetic_fetch_payloads()
    sf = SceneFetcher(0.0, 0.0, radius_m=700.0)
    feats = sf.features_from_osm(osm)
    elev = sf.elevation_from_grid(elev_grid, smooth_sigma=1.0)

    meshes = world.build_world(feats, elev)
    meshes += world.placement_meshes(elevation=elev)
    obj = world.export_obj(os.path.join(args.outdir, "placed_scene.obj"),
                           meshes)
    png = world.render_preview(
        os.path.join(args.outdir, "placed_scene.png"), meshes)
    print("world:", obj, png)

    # --- simulation bridge: terrain/feature clutter + placed vehicles ---
    rng = np.random.default_rng(7)
    clutter = features_to_point_targets(feats, elev, density_per_m2=2e-4,
                                        rng=rng)
    vehicles = placement_targets(elevation=elev)
    scene = T.PointTargets.concatenate([clutter, vehicles])
    # center the imaged patch on the vehicle cluster
    center = np.array([10.0, 320.0, 0.0])
    scene = scene.translate(-center)
    print(f"scene: {clutter.num} clutter + {vehicles.num} vehicle scatterers")

    # --- collect + focus ---
    sc = cfg.videosar()
    g = sc.geometry
    traj = orbit.make_trajectory(
        g, orbit.slow_time_grid(args.pulses / 5000.0, args.pulses))
    opts = EchoOpts(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6, pulse_width_s=2e-6,
                    fs_hz=180e6, num_samples=2048, endpoint_grid=False,
                    chirp_centering="centered", amplitude="sqrt_rcs",
                    stop_and_go=True)
    t0 = window_start_time(g.slant_range_m, opts,
                           opts.num_samples / opts.fs_hz, "centered")
    raw = phase_history(traj, scene, opts, t_start=t0)
    p = bp_ops.BpParams(fc_hz=opts.fc_hz, chirp_rate=opts.chirp_rate,
                        fs_hz=opts.fs_hz, pulse_width_s=opts.pulse_width_s,
                        num_samples=opts.num_samples, nx=256, ny=256,
                        scene_size_m=900.0)
    img = np.asarray(bp_fast.focus_bp_fast(
        raw, traj.positions, traj.velocities, traj.times, np.zeros(3),
        float(t0), p, accumulate="factor"))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    mag = 20 * np.log10(np.abs(img) + 1e-9)
    plt.figure(figsize=(7, 6))
    plt.imshow(mag, origin="lower", cmap="gray",
               extent=[-450, 450, -450, 450],
               vmin=mag.max() - 60, vmax=mag.max())
    plt.colorbar(label="dB")
    plt.title("Placed-scene SAR image (six reference placements)")
    plt.xlabel("x [m]")
    plt.ylabel("y [m]")
    out = os.path.join(args.outdir, "placed_scene_sar.png")
    plt.savefig(out, dpi=110)
    print("sar image:", out)


if __name__ == "__main__":
    main()
