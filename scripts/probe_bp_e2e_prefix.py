"""Round-3 probe: IN-CONTEXT stage costs of the factor_pallas BP frame.

Times cumulative prefixes of the single-jit pipeline (each prefix is one
jit program, streamed 4x): recentre | +fit | +accumulate | +finalize.
Differences give each stage's cost as scheduled inside the real program,
unlike scripts/probe_bp_factor_stages.py's separately-jitted rows.
Run alone on the TPU; ~4-ms dispatch overhead rides every number.
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
from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

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
sub_p = max(1, plan.sub_raw // d)

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


band_end = plan.band_start + plan.stride * (plan.ny_i - 1) + plan.w_win
p0, p1 = plan.band_start // 128, -(-band_end // 128)
from dataclasses import replace as _dc_replace
plan_acc = _dc_replace(plan, band_start=plan.band_start - p0 * 128)


def prefix(stage: str):
    def fn(raw):
        rc2, pos2, vel2, t2 = fft_kernel.recenter_presum_pallas(
            raw, pos, vel, ts, vf, p, d, plan.t_ref, t_mean=tm,
            out_rows=(p0, p1))
        if stage == "recentre":
            return rc2
        rdir, cdir, dy_m = bp_fast._frame_geometry(
            pos2[pos2.shape[0] // 2], p, plan)
        co = bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan, tm,
                                 rdir, cdir, dy_m, fit_stride=8)
        if stage == "fit":
            # consume rc2 too — otherwise XLA DCEs the whole pallas kernel
            # out of this prefix and the difference row is meaningless
            return co[0] + co[1] + jnp.abs(rc2[:co[0].shape[0], :1])
        img_i = bp_fast._accumulate_factor(rc2, *co, plan_acc, sub_p)
        if stage == "acc":
            return img_i
        return bp_fast._finalize(img_i, co[1:4], pos2, vel2, t2, vf, tm,
                                 p, plan, rdir, cdir, dy_m)
    return jax.jit(fn)


def stream(fn, n=4):
    out = fn(raw)
    float(jnp.sum(jnp.abs(out.reshape(-1)[:1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(raw)
    float(jnp.sum(jnp.abs(out.reshape(-1)[:1])))
    return 1000 * (time.perf_counter() - t1) / n


prev = 0.0
for stage in ("recentre", "fit", "acc", "full"):
    t = stream(prefix(stage))
    print(f"prefix {stage:9s}: {t:7.1f} ms  (+{t - prev:6.1f})", flush=True)
    prev = t
