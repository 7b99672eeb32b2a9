"""Round-3 probe: where does the pallas recentre+presum kernel's time go?

mode bf16x3 vs bf16 triples vs singles the MXU block-dot count: if the
times barely differ the kernel is VPU/pipeline-bound and band-limited
output slicing won't pay either. Also sweeps `groups` (pulses per grid
step) and times the XLA recenter_presum for reference.
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
print("nfft", plan.nfft, "d", d, flush=True)

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


def stream(fn, args, n=4):
    out = fn(*args)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    return 1000 * (time.perf_counter() - t1) / n


for mode in ("bf16x3", "bf16"):
    for groups in (2, 4, 8):
        fn = jax.jit(lambda x, m=mode, gr=groups:
                     fft_kernel.recenter_presum_pallas(
                         x, pos, vel, ts, vf, p, d, plan.t_ref,
                         mode=m, groups=gr, t_mean=tm)[0])
        print(f"pallas mode={mode:6s} groups={groups}: "
              f"{stream(fn, (raw,)):7.1f} ms", flush=True)

ref_conj = bp_fast.matched_filter_spectrum(p, plan.nfft)
fn = jax.jit(lambda x: bp_fast.recenter_presum(
    x, pos, vel, ts, vf, p, d, plan.t_ref, ref_conj=ref_conj, t_mean=tm)[0])
print(f"xla recenter_presum      : {stream(fn, (raw,)):7.1f} ms", flush=True)
