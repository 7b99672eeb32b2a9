"""Exploration: fast BP vs exact backprojection at small scale (CPU)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.constants import C
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
from nis_sar_amtigmti_video_tpu.ops import bp_fast
from nis_sar_amtigmti_video_tpu.ops.echo import EchoOpts, phase_history, window_start_time
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.utils import cplx

sc = cfg.videosar()
g = sc.geometry
n_p = 192
traj = orbit.make_trajectory(g, orbit.slow_time_grid(n_p / 5000.0, n_p))
tgts = T.PointTargets.concatenate([
    T.point_target((0.0, 0.0, 0.0), 30.0),
    T.point_target((150.0, -120.0, 0.0), 20.0),
    T.point_target((-170.0, 140.0, 0.0), 25.0),
])
vel = np.array([0.0, 0.0, 0.0])
lam = C / 9.65e9
opts = EchoOpts(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6,
                pulse_width_s=2e-6, fs_hz=180e6, num_samples=1024,
                endpoint_grid=False, chirp_centering="centered",
                amplitude="rcs", stop_and_go=True,
                antenna_length_m=lam * g.slant_range_m / 500.0)
t0 = window_start_time(g.slant_range_m, opts, 1024 / 180e6, "centered")
raw = cplx.to_host(phase_history(traj, tgts, opts, t_start=t0,
                                 target_velocity=vel))

p = bp_ops.BpParams(fc_hz=opts.fc_hz, chirp_rate=opts.chirp_rate,
                    fs_hz=opts.fs_hz, pulse_width_s=opts.pulse_width_s,
                    num_samples=1024, nx=64, ny=64, scene_size_m=400.0,
                    precision="f64")

exact = cplx.to_host(bp_ops.focus_bp(
    cplx.to_device(raw), traj.positions, traj.velocities, traj.times,
    vel, t0, p))

plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0))
print("plan:", plan)
fast = cplx.to_host(bp_fast.focus_bp_fast(
    cplx.to_device(raw), traj.positions, traj.velocities, traj.times,
    vel, float(t0), p, presum=1, plan=plan))

a_e, a_f = np.abs(exact), np.abs(fast)
pk_e = np.unravel_index(a_e.argmax(), a_e.shape)
pk_f = np.unravel_index(a_f.argmax(), a_f.shape)
print("peak exact", pk_e, a_e.max(), "fast", pk_f, a_f.max())
print("peak dB diff:", 20 * np.log10(a_f.max() / a_e.max()))
print("field max rel diff:", np.abs(a_f - a_e).max() / a_e.max())
print("field rms rel diff:", np.sqrt(np.mean(np.abs(fast - exact) ** 2)) / a_e.max())
print("peak phase diff:", np.angle(fast[pk_e] * np.conj(exact[pk_e])))
# per-target peaks
x = np.linspace(-200, 200, 64)
for tx, ty in [(0, 0), (150, -120), (-170, 140)]:
    ix = np.argmin(np.abs(x - tx)); iy = np.argmin(np.abs(x - ty))
    s = (slice(max(0, iy - 2), iy + 3), slice(max(0, ix - 2), ix + 3))
    pe = np.abs(exact[s]).max(); pf = np.abs(fast[s]).max()
    print(f"tgt ({tx},{ty}): exact {pe:.3f} fast {pf:.3f} "
          f"dB {20*np.log10(pf/pe):+.4f}")
