"""Round-3 probe: A/B the recentre kernel's exact-slicing wins.

Rows (same session, chained stream of n=6, one sync):
  full      — input pre-padded to nfft (emulates the round-2 kernel: full
              forward columns, full inverse rows)
  ns        — forward weight columns sliced to the 22,004 populated rows
  ns+band   — plus the inverse band-limited to the accumulate's 128-aligned
              iso-range rows (out_rows), as production bp_fast now calls it
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
from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel as FK

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
p0 = plan.band_start // 128
p1 = -(-band_end // 128)
print(f"ns={opts.num_samples} nfft={plan.nfft} band rows [{p0},{p1}) of "
      f"{plan.nfft // 128}", flush=True)

key = jax.random.PRNGKey(1)
raw = jax.lax.complex(
    jax.random.normal(key, (sched, opts.num_samples), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (sched, opts.num_samples), jnp.float32))
raw_full = jnp.pad(raw, ((0, 0), (0, plan.nfft - opts.num_samples)))
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


for name, x, kw in (
        ("full   ", raw_full, {}),
        ("ns     ", raw, {}),
        ("ns+band", raw, {"out_rows": (p0, p1)})):
    fn = jax.jit(lambda v, kw=kw: FK.recenter_presum_pallas(
        v, pos, vel, ts, vf, p, d, plan.t_ref, t_mean=tm, **kw)[0])
    print(f"{name}: {stream(fn, x):7.1f} ms", flush=True)
