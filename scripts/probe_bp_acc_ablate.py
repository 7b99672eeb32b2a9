"""Ablation timing for the pallas BP accumulate kernel: which stage owns
the 62 ms? Monkeypatches stages out of the kernel body one at a time.
Study artifact — run alone on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models import videosar
from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
from nis_sar_amtigmti_video_tpu.ops import bp_fast
from nis_sar_amtigmti_video_tpu.ops.pallas import bp_kernel, fft_kernel

print("device:", jax.devices()[0])
sc = cfg.videosar()
r, g = sc.radar, sc.geometry
sched_pulses = 2500
l_ant = videosar.antenna_length_for_swath(sc, sc.processing.bp_scene_size_m)
opts = videosar.spotlight_echo_opts(sc, l_ant)
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
t0 = window_start_time(g.slant_range_m, opts, sc.collect.window_length_s,
                       "centered")
p = videosar.bp_params_for(sc, opts, "f32")
d_ps = bp_ops.presum_factor(p, r.prf_hz, r.wavelength_m, g.slant_range_m,
                            g.effective_velocity_mps)
tb = np.linspace(-sched_pulses / r.prf_hz / 2, sched_pulses / r.prf_hz / 2,
                 sched_pulses)
traj = orbit.make_trajectory(g, tb)
plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0), w_win=64)


@jax.jit
def mk(key):
    return jax.lax.complex(
        jax.random.normal(key, (sched_pulses, opts.num_samples), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (sched_pulses, opts.num_samples), jnp.float32))


raw = mk(jax.random.PRNGKey(1))
pos = jnp.asarray(traj.positions, jnp.float64)
vel = jnp.asarray(traj.velocities, jnp.float64)
ts = jnp.asarray(traj.times, jnp.float64)
vf = jnp.zeros(3, jnp.float64)

rc2, pos2, vel2, t2 = jax.jit(lambda x: fft_kernel.recenter_presum_pallas(
    x, pos, vel, ts, vf, p, d_ps, plan.t_ref))(raw)


def fit(pos2, vel2, t2):
    rdir, cdir, dy = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p, plan)
    return bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan, jnp.mean(ts),
                               rdir, cdir, dy)


co = jax.jit(fit)(pos2, vel2, t2)


def sync(x):
    return float(jnp.sum(jnp.abs(x[:2, :2])))


import nis_sar_amtigmti_video_tpu.ops.pallas.bp_kernel as bk


def time_variant(name, **kw):
    fn = jax.jit(lambda a, b: bk.accumulate_pallas(a, *b, plan, **kw))
    img = fn(rc2, co)
    _ = sync(img)
    t1 = time.perf_counter()
    for _ in range(4):
        img = fn(rc2, co)
    _ = sync(img)
    print(f"{name}: {1000 * (time.perf_counter() - t1) / 4:.1f} ms")


time_variant("baseline bf16x3")
time_variant("mode=bf16", mode="bf16")

# ablations: replace one kernel stage with identity
for knob in ("no_phase", "no_taper", "no_ramp"):
    time_variant(f"ablate {knob}", ablate=knob)

time_variant("tile_y=1536 block=8", tile_y=1536, block=8)
time_variant("tile_y=1536 block=16", tile_y=1536, block=16)
time_variant("tile_y=768 block=16", tile_y=768, block=16)

time_variant("ablate min_body", ablate="min_body")
