"""TPU timing: the pallas pixel-tile BP accumulate kernel alone + the full
fast-BP frame through it (w_win=64 plan). Run alone on the axon tunnel."""
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
from nis_sar_amtigmti_video_tpu.ops.pallas import bp_kernel
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

print("device:", jax.devices()[0])
sc = cfg.videosar()
r, g = sc.radar, sc.geometry
sched_pulses = 2500
l_ant = videosar.antenna_length_for_swath(sc, sc.processing.bp_scene_size_m)
opts = videosar.spotlight_echo_opts(sc, l_ant)
t0 = window_start_time(g.slant_range_m, opts, sc.collect.window_length_s,
                       "centered")
p = videosar.bp_params_for(sc, opts, "f32")
d_ps = bp_ops.presum_factor(p, r.prf_hz, r.wavelength_m, g.slant_range_m,
                            g.effective_velocity_mps)
tb = np.linspace(-sched_pulses / r.prf_hz / 2, sched_pulses / r.prf_hz / 2,
                 sched_pulses)
traj = orbit.make_trajectory(g, tb)
plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0), w_win=64)
print("plan64:", plan.ny_i, plan.nx_i, plan.stride, "supported:",
      bp_kernel.supported(plan))


@jax.jit
def mk(key):
    return jax.lax.complex(
        jax.random.normal(key, (sched_pulses, opts.num_samples), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (sched_pulses, opts.num_samples), jnp.float32))


raw = mk(jax.random.PRNGKey(1))


def sync(x):
    return float(jnp.sum(jnp.abs(x[:2, :2])))


fbp_pl = jax.jit(lambda x: bp_fast.focus_bp_fast(
    x, traj.positions, traj.velocities, traj.times, np.zeros(3), float(t0),
    p, presum=d_ps, plan=plan, accumulate="pallas"))
t1 = time.perf_counter()
o = fbp_pl(raw)
print(f"pallas compile+first: {time.perf_counter() - t1:.1f} s "
      f"(sum {sync(o):.4e})")
for _ in range(4):
    t1 = time.perf_counter()
    o = fbp_pl(raw)
    _ = sync(o)
    print(f"pallas full frame: {1000 * (time.perf_counter() - t1):.1f} ms")

# stage: the kernel alone
pos = jnp.asarray(traj.positions, jnp.float64)
vel = jnp.asarray(traj.velocities, jnp.float64)
ts = jnp.asarray(traj.times, jnp.float64)
vf = jnp.zeros(3, jnp.float64)
st_rc = jax.jit(lambda x: bp_fast.recenter_presum(
    x, pos, vel, ts, vf, p, d_ps, plan.t_ref,
    ref_conj=bp_fast.matched_filter_spectrum(p, plan.nfft)))


def st_fit(pos2, vel2, t2):
    rdir, cdir, dy = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p, plan)
    return bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan, jnp.mean(ts),
                               rdir, cdir, dy)


rc2, pos2, vel2, t2 = st_rc(raw)
co = jax.jit(st_fit)(pos2, vel2, t2)
st_acc = jax.jit(lambda a, b: bp_kernel.accumulate_pallas(a, *b, plan))
img = st_acc(rc2, co)
_ = sync(img)
for name, fn, args in [("fused compress+recentre+presum", st_rc, (raw,)),
                       ("pallas accumulate", st_acc, (rc2, co))]:
    out = fn(*args)
    _ = sync(out[0] if isinstance(out, tuple) else out)
    t1 = time.perf_counter()
    for _ in range(4):
        out = fn(*args)
    _ = sync(out[0] if isinstance(out, tuple) else out)
    print(f"{name}: {1000 * (time.perf_counter() - t1) / 4:.1f} ms")

# ---- pallas fused compress+recentre+presum (four-step FFT kernel) ----
from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel
print("fft_kernel supported:", fft_kernel.supported(plan.nfft))
st_rc_pl = jax.jit(lambda x: fft_kernel.recenter_presum_pallas(
    x, pos, vel, ts, vf, p, d_ps, plan.t_ref))
out = st_rc_pl(raw)
_ = sync(out[0])
# equality vs the XLA fused path
w = st_rc(raw)
num = float(jnp.max(jnp.abs(out[0] - w[0])))
den = float(jnp.max(jnp.abs(w[0])))
print(f"pallas recentre rel err vs xla: {num / den:.2e}")
t1 = time.perf_counter()
for _ in range(4):
    out = st_rc_pl(raw)
_ = sync(out[0])
print(f"pallas recentre+presum: {1000 * (time.perf_counter() - t1) / 4:.1f} ms")
