"""Round-3 probe: per-stage times of the factorized fast-BP path on TPU.

Streamed measurement (4 chained dispatches, one sync) per stage at the
reference VideoSAR workload. Run alone (one TPU process on the tunnel).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models import videosar
from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
from nis_sar_amtigmti_video_tpu.ops import bp_fast
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel

sc = cfg.videosar()
r, g = sc.radar, sc.geometry
sched = 2500
l_ant = videosar.antenna_length_for_swath(sc, sc.processing.bp_scene_size_m)
opts = videosar.spotlight_echo_opts(sc, l_ant)
t0 = window_start_time(g.slant_range_m, opts, sc.collect.window_length_s,
                       "centered")
p = videosar.bp_params_for(sc, opts, "f32")
d = bp_ops.presum_factor(p, r.prf_hz, r.wavelength_m, g.slant_range_m,
                         g.effective_velocity_mps)
tb = np.linspace(-sched / r.prf_hz / 2, sched / r.prf_hz / 2, sched)
traj = orbit.make_trajectory(g, tb)
plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0),
                         factorize=True)
print("plan:", plan.ny_i, plan.nx_i, "sub_raw", plan.sub_raw,
      "nx_c", plan.nx_c, "presum", d, flush=True)

key = jax.random.PRNGKey(1)
raw = jax.lax.complex(
    jax.random.normal(key, (sched, opts.num_samples), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (sched, opts.num_samples), jnp.float32))

pos = jnp.asarray(traj.positions, jnp.float64)
vel = jnp.asarray(traj.velocities, jnp.float64)
ts = jnp.asarray(traj.times, jnp.float64)
vf = jnp.zeros(3, jnp.float64)
tm = jnp.mean(ts)


def sync(x):
    x = x[0] if isinstance(x, (tuple, list)) else x
    return float(jnp.sum(jnp.abs(x[:1, :1])))


def stream(fn, args, n=4):
    out = fn(*args)
    sync(out)
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return 1000 * (time.perf_counter() - t1) / n


ref_conj = bp_fast.matched_filter_spectrum(p, plan.nfft)
rc_x = jax.jit(lambda x: bp_fast.recenter_presum(
    x, pos, vel, ts, vf, p, d, plan.t_ref, ref_conj=ref_conj, t_mean=tm))
rc_p = jax.jit(lambda x: fft_kernel.recenter_presum_pallas(
    x, pos, vel, ts, vf, p, d, plan.t_ref, t_mean=tm))

rc2, pos2, vel2, t2 = rc_x(raw)
print(f"recentre pallas : {stream(rc_p, (raw,)):7.1f} ms", flush=True)


def fit(pos2, vel2, t2, fs_=0):
    rdir, cdir, dy = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p,
                                             plan)
    return bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan, tm, rdir, cdir,
                               dy, fit_stride=fs_), (rdir, cdir, dy)


fit_j = jax.jit(fit)
co, geo = fit_j(pos2, vel2, t2)
for fs_ in (0, 8):
    fj = jax.jit(lambda a, b, c, fs_=fs_: fit(a, b, c, fs_)[0])
    fit_t = stream(fj, (pos2, vel2, t2))
    print(f"fit stride={fs_:2d}   : {fit_t:7.1f} ms", flush=True)

sub_p = max(1, plan.sub_raw // d)
for sp in (sub_p,):
    acc = jax.jit(lambda rc2, co, sp=sp: bp_fast._accumulate_factor(
        rc2, *co, plan, sp))
    print(f"factor acc sub_p={sp:3d}: {stream(acc, (rc2, co)):7.1f} ms",
          flush=True)

fin = jax.jit(lambda img, co, pos2, vel2, t2: bp_fast._finalize(
    img, co[1:4], pos2, vel2, t2, vf, tm, p, plan, *geo))
acc0 = jax.jit(lambda rc2, co: bp_fast._accumulate_factor(rc2, *co, plan,
                                                          sub_p))
img_i = acc0(rc2, co)
print(f"finalize        : {stream(fin, (img_i, co, pos2, vel2, t2)):7.1f} ms",
      flush=True)

for mode, fs_ in (("factor_pallas", 8),):
    fbp = jax.jit(lambda x, m=mode, f_=fs_: bp_fast.focus_bp_fast(
        x, traj.positions, traj.velocities, traj.times, np.zeros(3),
        float(t0), p, presum=d, plan=plan, accumulate=m, fit_stride=f_))
    print(f"end-to-end {mode:14s} fs={fs_}: {stream(fbp, (raw,)):7.1f} ms",
          flush=True)
