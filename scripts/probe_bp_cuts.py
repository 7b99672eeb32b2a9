"""Round-3 probe: candidate cuts for the two remaining BP blocks.

Block A — recentre kernel structural overhead: sweep ``groups`` (pulses per
grid step = presum*groups; 313 steps at groups=2). Streamed n=6.

Block B — factor-accumulate einsum precision: the (t,m=32,y)x(t,m=32,x)
complex einsum at Precision.HIGHEST is a 6-pass bf16 contraction with K=32
(the MXU-hostile width). Variants: HIGHEST, bf16x3 manual split (5e-6),
DEFAULT (single bf16 pass). Reports time and field rel-err vs HIGHEST.
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
band_end = plan.band_start + plan.stride * (plan.ny_i - 1) + plan.w_win
p0, p1 = plan.band_start // 128, -(-band_end // 128)

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


print("== A: recentre groups sweep (blk = presum*groups) ==", flush=True)
for grp in ([] if __import__("os").environ.get("SKIP_A") else (2, 4, 8, 16)):
    fn = jax.jit(lambda x, grp=grp: fft_kernel.recenter_presum_pallas(
        x, pos, vel, ts, vf, p, d, plan.t_ref, t_mean=tm,
        out_rows=(p0, p1), groups=grp)[0])
    print(f"groups={grp:2d}: {stream(fn, x=raw):7.1f} ms", flush=True)

print("== B: accumulate einsum precision ==", flush=True)
from dataclasses import replace as _dc_replace

plan_acc = _dc_replace(plan, band_start=plan.band_start - p0 * 128)
sub_p = max(1, plan.sub_raw // d)

rc_fn = jax.jit(lambda x: fft_kernel.recenter_presum_pallas(
    x, pos, vel, ts, vf, p, d, plan.t_ref, t_mean=tm, out_rows=(p0, p1)))
rc2, pos2, vel2, t2 = rc_fn(raw)
rdir, cdir, dy_m = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p,
                                           plan)
co = jax.jit(lambda a, b, c: bp_fast._fit_coeffs(
    a, b, c, vf, p, plan, tm, rdir, cdir, dy_m, fit_stride=8))(
        pos2, vel2, t2)

from nis_sar_amtigmti_video_tpu.utils import cplx

base = None
for prec in ("highest", "bf16x3", "default"):
    import nis_sar_amtigmti_video_tpu.ops.bp_fast as BF
    fn = jax.jit(lambda x, pr=prec: BF._accumulate_factor(
        x, *co, plan_acc, sub_p, einsum_prec=pr))
    t = stream(fn, rc2)
    out = cplx.to_host(fn(rc2))
    if base is None:
        base = out
        rel = 0.0
    else:
        rel = np.linalg.norm(out - base) / np.linalg.norm(base)
    print(f"einsum {prec:8s}: {t:7.1f} ms   rel-err {rel:.2e}", flush=True)
