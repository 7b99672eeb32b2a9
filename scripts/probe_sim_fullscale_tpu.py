"""TPU timing: full-reference-scale two-channel echo synthesis
(2 ch x (36 ship + 5,000 clutter) x 7,200 x 13,200 — the workload of
sar_ati_dcpa_sim_csa.py:106-197) with the golden 'freq' NUFFT backend,
structured like the reference's four GPU passes (ship/clutter x rx1/rx2);
per-channel arrays throughout (a (2, 7200, 13200) complex64 stack hits the
64x tile-padded layout trap on TPU). Run alone on the axon tunnel."""
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

print("device:", jax.devices()[0])
sc = cfg.ati_dpca()
# 'freq' needs the uniform fast-time grid: swap the reference's endpoint
# quirk for the centered window (same physics, acceptance-tested variant)
sc = dataclasses.replace(
    sc, collect=dataclasses.replace(sc.collect, echo_backend="freq",
                                    window_start_mode="centered"))
ship = T.destroyer().rotate_z(90.0)
clutter = ocean_clutter_field(np.random.default_rng(0))
vel = np.array([0.0, 4.0, 0.0])
print("targets:", ship.num + clutter.num)

r, g, c = sc.radar, sc.geometry, sc.collect
n_p = c.num_pulses(r.prf_hz)
traj = orbit.make_trajectory(g, orbit.slow_time_grid(c.integration_time_s,
                                                     n_p))
opts = echo_opts_for(sc)
opts = dataclasses.replace(opts, max_elements=2 ** 25)
t0 = window_start_time(g.slant_range_m, opts, c.window_length_s,
                       c.window_start_mode)
offs = sc.channels.rx_offsets()


def sim_two_channel():
    """The reference's 4-pass structure: (ship, clutter) x (rx1, rx2)."""
    chans = []
    for off in offs:
        a = phase_history(traj, ship, opts, t_start=t0, rx_offset=off,
                          target_velocity=vel)
        b = phase_history(traj, clutter, opts, t_start=t0, rx_offset=off)
        chans.append(a + b)
    return chans


t1 = time.perf_counter()
chans = sim_two_channel()
s = float(jnp.sum(jnp.abs(chans[-1][:1, :1])))
print(f"compile+first: {time.perf_counter() - t1:.1f} s "
      f"(shape {chans[0].shape}, sum {s:.3e})")

for _ in range(3):
    t1 = time.perf_counter()
    chans = sim_two_channel()
    _ = float(jnp.sum(jnp.abs(chans[-1][:1, :1])))
    print(f"full 2-ch 4-pass sim: {time.perf_counter() - t1:.2f} s")

# direct 'jnp' backend at 1/10 pulses for the speedup ratio
opts_j = dataclasses.replace(opts, backend="jnp")
traj_s = orbit.make_trajectory(g, orbit.slow_time_grid(
    c.integration_time_s / 10.0, n_p // 10))
for tag in range(2):
    t1 = time.perf_counter()
    a = phase_history(traj_s, ship, opts_j, t_start=t0, rx_offset=offs[0],
                      target_velocity=vel)
    b = phase_history(traj_s, clutter, opts_j, t_start=t0,
                      rx_offset=offs[0])
    _ = float(jnp.sum(jnp.abs((a + b)[:1, :1])))
    print(f"jnp 1-ch 1/10-pulse sim ({'compile+' if tag == 0 else ''}run): "
          f"{time.perf_counter() - t1:.2f} s")
