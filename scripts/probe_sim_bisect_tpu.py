"""Staged TPU bisection of the full-scale 'freq' sim (worker-crash hunt).
Stage A: 500 clutter targets, full 7,200 pulses.
Stage B: 5,035 targets, 720 pulses.
Stage C: full scale (5,035 x 7,200).
Each stage syncs before the next, so the log shows the first fatal stage.
Run alone on the axon tunnel."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops.echo import (phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field

print("device:", jax.devices()[0], flush=True)
sc = cfg.ati_dpca()
sc = dataclasses.replace(
    sc, collect=dataclasses.replace(sc.collect, echo_backend="freq",
                                    window_start_mode="centered"))
ship = T.destroyer().rotate_z(90.0)
vel = np.array([0.0, 4.0, 0.0])
r, g, c = sc.radar, sc.geometry, sc.collect
opts = dataclasses.replace(echo_opts_for(sc), max_elements=2 ** 25)
t0 = window_start_time(g.slant_range_m, opts, c.window_length_s,
                       c.window_start_mode)
off = sc.channels.rx_offsets()[0]
n_p_full = c.num_pulses(r.prf_hz)


def run(tag, n_clutter, n_p):
    clut = ocean_clutter_field(np.random.default_rng(0),
                               num_points=n_clutter)
    traj = orbit.make_trajectory(
        g, orbit.slow_time_grid(n_p / r.prf_hz, n_p))
    t1 = time.perf_counter()
    a = phase_history(traj, clut, opts, t_start=t0, rx_offset=off)
    s = float(jnp.sum(jnp.abs(a[:1, :1])))
    print(f"{tag}: n_clutter={n_clutter} n_p={n_p} "
          f"compile+run {time.perf_counter() - t1:.1f} s (sum {s:.3e})",
          flush=True)
    t1 = time.perf_counter()
    a = phase_history(traj, clut, opts, t_start=t0, rx_offset=off)
    s = float(jnp.sum(jnp.abs(a[:1, :1])))
    print(f"{tag}: steady run {time.perf_counter() - t1:.2f} s", flush=True)


run("A", 500, n_p_full)
run("B", 5000, n_p_full // 10)
run("C", 5000, n_p_full)
print("ALL STAGES OK", flush=True)
