"""TPU: recentre kernel fori_loop vs unrolled presum sum (round-5 BP).

The narrow kernel's per-pulse forward chains are independent until the
frequency-domain presum, but the fori_loop carry serializes them on an
op-latency-bound kernel. Unrolled variant is bit-identical in sum order.
Standalone chained protocol (8 iters, one sync), reference workload.
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
from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel
from nis_sar_amtigmti_video_tpu.utils import cplx

print("device:", jax.devices()[0])
scv = cfg.videosar()
rv, gv = scv.radar, scv.geometry
sched_pulses = 2500
l_ant = videosar.antenna_length_for_swath(scv, scv.processing.bp_scene_size_m)
opts = videosar.spotlight_echo_opts(scv, l_ant)
t0b = window_start_time(gv.slant_range_m, opts, scv.collect.window_length_s,
                        "centered")
p_bp = videosar.bp_params_for(scv, opts, "f32")
d_ps = bp_ops.presum_factor(p_bp, rv.prf_hz, rv.wavelength_m,
                            gv.slant_range_m, gv.effective_velocity_mps)
tb = np.linspace(-sched_pulses / rv.prf_hz / 2,
                 sched_pulses / rv.prf_hz / 2, sched_pulses)
trajb = orbit.make_trajectory(gv, tb)
plan = bp_fast.make_plan(p_bp, np.asarray(trajb.positions),
                         np.asarray(trajb.times), float(t0b),
                         factorize=True)
band_end = plan.band_start + plan.stride * (plan.ny_i - 1) + plan.w_win
p0, p1 = plan.band_start // 128, -(-band_end // 128)

rng = np.random.default_rng(1)
raw_np = (rng.standard_normal((sched_pulses, opts.num_samples))
          + 1j * rng.standard_normal((sched_pulses, opts.num_samples))
          ).astype(np.complex64)
raw = cplx.to_device(raw_np)
pos = jnp.asarray(trajb.positions, jnp.float64)
vel = jnp.asarray(trajb.velocities, jnp.float64)
ts = jnp.asarray(trajb.times, jnp.float64)
vf = jnp.zeros(3, jnp.float64)

ref = None
for unroll in (False, True):
    fn = jax.jit(lambda x, u=unroll: fft_kernel.recenter_presum_pallas(
        x, pos, vel, ts, vf, p_bp, d_ps, plan.t_ref,
        out_rows=(p0, p1), mode="bf16x3", groups=2, unroll=u)[0])
    out = fn(raw)
    _ = float(jnp.sum(jnp.abs(out[:1, :1])))
    t1 = time.perf_counter()
    for _ in range(8):
        out = fn(raw)
    _ = float(jnp.sum(jnp.abs(out[:1, :1])))
    ms = 1000.0 * (time.perf_counter() - t1) / 8
    if ref is None:
        ref = out
        print(f"unroll={unroll}: {ms:7.2f} ms  (anchor)", flush=True)
    else:
        d = float(jnp.max(jnp.abs(out - ref)))
        print(f"unroll={unroll}: {ms:7.2f} ms  maxdiff {d:.2e}", flush=True)
