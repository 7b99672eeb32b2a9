"""Round-3 probe: e2e factorized BP ``math_mode`` knob — time AND field
accuracy at reference scale (512^2 scene, 2,500 pulses, 22,004 samples).

'exact'  = bf16x3 recentre dots + HIGHEST factor einsum (shipping default)
'fast'   = single-pass bf16 recentre dots (groups=8) + DEFAULT einsum

Accuracy is the field rel-err of each mode vs the plain-XLA exact path
(accumulate='factor', f32 recentre) on the SAME random raw block — the
same metric class as tests/test_bp_fast.py's 1%-field gate.
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

key = jax.random.PRNGKey(1)
raw = jax.lax.complex(
    jax.random.normal(key, (sched, opts.num_samples), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (sched, opts.num_samples), jnp.float32))


def stream(fn, x, n=6):
    out = fn(x)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    return 1000 * (time.perf_counter() - t1) / n


def run(acc, mm):
    fn = jax.jit(lambda x: bp_fast.focus_bp_fast(
        x, traj.positions, traj.velocities, traj.times, np.zeros(3),
        float(t0), p, presum=d, plan=plan, accumulate=acc, fit_stride=8,
        math_mode=mm))
    t = stream(fn, raw)
    out = fn(raw)
    a = np.abs(np.asarray(jnp.abs(out), np.float32))
    return t, a


t_ref_ms, a_ref = run("factor", "exact")          # plain XLA recentre path
print(f"xla-recentre exact : {t_ref_ms:7.1f} ms  (accuracy anchor)",
      flush=True)
for mm in ("exact", "fast"):
    t, a = run("factor_pallas", mm)
    rel = np.abs(a - a_ref).max() / a_ref.max()
    print(f"factor_pallas {mm:5s}: {t:7.1f} ms   field rel-err {rel:.2e}",
          flush=True)
