"""TPU timing: fast BP at reference scale (512^2, 2500 pulses, 22k samples).

Run alone (one TPU process at a time on the axon tunnel). Prints per-stage
and end-to-end frame times.
"""
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
plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0))
print("presum:", d_ps, "plan:", plan.ny_i, plan.nx_i, plan.stride,
      "band:", plan.band_start, "ns:", opts.num_samples)


@jax.jit
def mk(key):
    return jax.lax.complex(
        jax.random.normal(key, (sched_pulses, opts.num_samples), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (sched_pulses, opts.num_samples), jnp.float32))


raw = mk(jax.random.PRNGKey(1))

fbp = jax.jit(lambda x: bp_fast.focus_bp_fast(
    x, traj.positions, traj.velocities, traj.times, np.zeros(3), float(t0),
    p, presum=d_ps, plan=plan))


def sync(x):
    return float(jnp.sum(jnp.abs(x[:2, :2])))


t1 = time.perf_counter()
o = fbp(raw)
s = sync(o)
print(f"compile+first run: {time.perf_counter() - t1:.1f} s (sum {s:.3e})")

for it in range(4):
    t1 = time.perf_counter()
    o = fbp(raw)
    _ = sync(o)
    print(f"full frame: {1000 * (time.perf_counter() - t1):.1f} ms")

# ---- stage split ----
pos = jnp.asarray(traj.positions, jnp.float64)
vel = jnp.asarray(traj.velocities, jnp.float64)
ts = jnp.asarray(traj.times, jnp.float64)
vf = jnp.zeros(3, jnp.float64)

st_cmp = jax.jit(lambda x: bp_ops.bp_range_compress(x, p))
st_rc = jax.jit(lambda x: bp_fast.recenter_presum(
    x, pos, vel, ts, vf, p, d_ps, plan.t_ref))


def st_fit(pos2, vel2, t2):
    rdir, cdir, dy = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p, plan)
    return bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan, jnp.mean(ts),
                               rdir, cdir, dy)


st_fit_j = jax.jit(st_fit)
st_acc = jax.jit(lambda rc2, co: bp_fast._accumulate(rc2, *co, plan))

rc = st_cmp(raw)
rc2, pos2, vel2, t2 = st_rc(rc)
co = st_fit_j(pos2, vel2, t2)
img_i = st_acc(rc2, co)
_ = sync(img_i)
for name, fn, args in [("range_compress", st_cmp, (raw,)),
                       ("recenter+presum", st_rc, (rc,)),
                       ("fit_coeffs", st_fit_j, (pos2, vel2, t2)),
                       ("accumulate", st_acc, (rc2, co))]:
    # streaming: chain 4 dispatches, one sync
    out = fn(*args)
    _ = sync(out[0] if isinstance(out, tuple) else out)
    t1 = time.perf_counter()
    for _i in range(4):
        out = fn(*args)
    _ = sync(out[0] if isinstance(out, tuple) else out)
    print(f"{name}: {1000 * (time.perf_counter() - t1) / 4:.1f} ms")

# ---- pallas pixel-tile accumulate (w=64 plan) ----
plan64 = bp_fast.make_plan(p, traj.positions, traj.times, float(t0), w_win=64)
print("plan64:", plan64.ny_i, plan64.nx_i, plan64.stride, plan64.band_start)
fbp_pl = jax.jit(lambda x: bp_fast.focus_bp_fast(
    x, traj.positions, traj.velocities, traj.times, np.zeros(3), float(t0),
    p, presum=d_ps, plan=plan64, accumulate="pallas"))
t1 = time.perf_counter()
o2 = fbp_pl(raw)
s2 = sync(o2)
print(f"pallas compile+first: {time.perf_counter() - t1:.1f} s (sum {s2:.4e}, "
      f"xla sum {sync(fbp(raw)):.4e})")
for it in range(4):
    t1 = time.perf_counter()
    o2 = fbp_pl(raw)
    _ = sync(o2)
    print(f"pallas full frame: {1000 * (time.perf_counter() - t1):.1f} ms")

st_acc_pl = jax.jit(lambda rc2, co: __import__(
    'nis_sar_amtigmti_video_tpu.ops.pallas.bp_kernel',
    fromlist=['x']).accumulate_pallas(rc2, *co, plan64))
# recompute coefficients on the w=64 plan for the stage timing
def st_fit64(pos2, vel2, t2):
    rdir, cdir, dy = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p,
                                             plan64)
    return bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan64, jnp.mean(ts),
                               rdir, cdir, dy)
co64 = jax.jit(st_fit64)(pos2, vel2, t2)
img64 = st_acc_pl(rc2, co64)
_ = sync(img64)
t1 = time.perf_counter()
for _i in range(4):
    img64 = st_acc_pl(rc2, co64)
_ = sync(img64)
print(f"pallas accumulate: {1000 * (time.perf_counter() - t1) / 4:.1f} ms")
