"""Round-3 probe: fused pallas factor-accumulate kernel vs the XLA factor
path at reference scale (512^2 scene, 2,500 pulses, 22,004 samples).

Rows:
  acc xla       — _accumulate_factor standalone (HIGHEST einsum)
  acc kernel    — accumulate_factor_pallas standalone (bf16x3 / bf16)
  e2e factor_pallas — committed XLA accumulate + pallas recentre
  e2e factor_kernel — fused kernel accumulate + pallas recentre
with field rel-err of each vs the XLA-exact anchor.
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
from nis_sar_amtigmti_video_tpu.ops.pallas import bp_factor_kernel, fft_kernel

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
assert bp_factor_kernel.supported(plan), plan
sub_p = max(1, plan.sub_raw // d)
print(f"plan ny_i={plan.ny_i} nx_i={plan.nx_i} nx_c={plan.nx_c} "
      f"sub_raw={plan.sub_raw} sub_p={sub_p} presum={d}", flush=True)

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


def stream(fn, x, n=6):
    out = fn(x)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    return 1000 * (time.perf_counter() - t1) / n


# ---- standalone accumulate comparison on fixed recentred operands ----
band_end = plan.band_start + plan.stride * (plan.ny_i - 1) + plan.w_win
p0, p1 = plan.band_start // 128, -(-band_end // 128)
from dataclasses import replace as _dc_replace

plan_acc = _dc_replace(plan, band_start=plan.band_start - p0 * 128)
rc_fn = jax.jit(lambda x: fft_kernel.recenter_presum_pallas(
    x, pos, vel, ts, vf, p, d, plan.t_ref, t_mean=tm, out_rows=(p0, p1)))
rc2, pos2, vel2, t2 = rc_fn(raw)
rdir, cdir, dy_m = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p, plan)
co = jax.jit(lambda a, b, c: bp_fast._fit_coeffs(
    a, b, c, vf, p, plan, tm, rdir, cdir, dy_m, fit_stride=8))(pos2, vel2, t2)

from nis_sar_amtigmti_video_tpu.utils import cplx

acc_x = jax.jit(lambda x: bp_fast._accumulate_factor(x, *co, plan_acc, sub_p))
t = stream(acc_x, rc2)
base = cplx.to_host(acc_x(rc2))
print(f"acc xla HIGHEST      : {t:7.1f} ms  (anchor)", flush=True)
for mode, feed in (("bf16x3", "windows"), ("bf16x3", "spectra"),
                   ("bf16", "windows")):
    fn = jax.jit(
        lambda x, m=mode, fd=feed: bp_factor_kernel.accumulate_factor_pallas(
            x, *co, plan_acc, sub_p, mode=m, feed=fd))
    t = stream(fn, rc2)
    out = cplx.to_host(fn(rc2))
    rel = np.linalg.norm(out - base) / np.linalg.norm(base)
    print(f"acc kernel {mode:7s} {feed:8s}: {t:7.1f} ms   rel-err {rel:.2e}",
          flush=True)

# ---- end-to-end ----
e_ref = None
for acc, mm in (("factor_pallas", "exact"), ("factor_kernel", "exact"),
                ("factor_kernel", "fast")):
    fn = jax.jit(lambda x, a=acc, m=mm: bp_fast.focus_bp_fast(
        x, traj.positions, traj.velocities, traj.times, np.zeros(3),
        float(t0), p, presum=d, plan=plan, accumulate=a, fit_stride=8,
        math_mode=m))
    t = stream(fn, raw)
    a_out = np.abs(cplx.to_host(fn(raw)))
    if e_ref is None:
        e_ref = a_out
        rel = 0.0
    else:
        rel = np.abs(a_out - e_ref).max() / e_ref.max()
    print(f"e2e {acc:14s} {mm:5s}: {t:7.1f} ms   field rel-err {rel:.2e}",
          flush=True)
