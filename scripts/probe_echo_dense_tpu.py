"""Round-3 probe: full ATI-scene echo pass with the dense (one-hot MXU)
spreader vs the scatter spreader and the direct engine.

Workload: one clutter+ship channel pass at the reference two-channel scale
(5,035 targets x 7,200 pulses x 13,200 samples; sar_ati_dcpa_sim_csa.py).
Run alone on the TPU; prints flush per line.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models.stripmap import echo_opts_for
from nis_sar_amtigmti_video_tpu.ops.echo import (EchoOpts, phase_history,
                                                 window_start_time)
from nis_sar_amtigmti_video_tpu.scene import targets as T_
from nis_sar_amtigmti_video_tpu.scene.clutter import ocean_clutter_field

import dataclasses

sc = cfg.ati_dpca()
rs, gs, cs = sc.radar, sc.geometry, sc.collect
opts0 = echo_opts_for(sc)
t0 = window_start_time(gs.slant_range_m, opts0, cs.window_length_s,
                       cs.window_start_mode)
ship = T_.destroyer().rotate_z(90.0)
clut = ocean_clutter_field(np.random.default_rng(0))
scene = T_.PointTargets.concatenate([ship, clut])
n_ps = cs.num_pulses(rs.prf_hz)
traj = orbit.make_trajectory(gs, orbit.slow_time_grid(cs.integration_time_s,
                                                      n_ps))
print(f"targets {scene.num} pulses {n_ps} samples {opts0.num_samples}",
      flush=True)


def run(tag, opts, t_start):
    t1 = time.perf_counter()
    a = phase_history(traj, scene, opts, t_start=t_start)
    s = float(jnp.sum(jnp.abs(a[:1, :1])))
    print(f"{tag}: compile+first {time.perf_counter() - t1:.1f} s "
          f"(sum {s:.3e})", flush=True)
    ts = []
    for _ in range(2):
        t1 = time.perf_counter()
        a = phase_history(traj, scene, opts, t_start=t_start)
        _ = float(jnp.sum(jnp.abs(a[:1, :1])))
        ts.append(time.perf_counter() - t1)
    print(f"{tag}: steady {min(ts):.2f} s", flush=True)
    return a


which = sys.argv[1] if len(sys.argv) > 1 else "all"
# uniform grid for 'freq'
t0u = window_start_time(gs.slant_range_m, opts0, cs.window_length_s,
                        "centered")
o_freq = dataclasses.replace(opts0, backend="freq", endpoint_grid=False)
if which in ("all", "dense"):
    run("freq dense  ", dataclasses.replace(o_freq, freq_spreader="dense"),
        t0u)
if which in ("all", "scatter"):
    run("freq scatter", dataclasses.replace(o_freq, freq_spreader="scatter"),
        t0u)
if which in ("all", "direct"):
    run("direct jnp  ", opts0, t0)
