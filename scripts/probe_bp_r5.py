"""TPU: cold-frame BP A/B for the round-5 <=33 ms target (r04 preview
37.0 ms). Chained 3-frame protocol identical to bench.py's bp_frame
section. A/Bs the anchored-fit stride (the fit was ~6 ms of the chip
time at stride 8) with a same-scene fidelity delta vs stride 8.
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
plan_bp = bp_fast.make_plan(p_bp, np.asarray(trajb.positions),
                            np.asarray(trajb.times), float(t0b),
                            factorize=True)
bp_acc = "factor2_pallas" if plan_bp.sub_raw1 > 0 else "factor_pallas"
print("plan:", plan_bp.ny_i, plan_bp.nx_i, "acc:", bp_acc,
      "presum:", d_ps, flush=True)

rng = np.random.default_rng(1)
raw_np = (rng.standard_normal((sched_pulses, opts.num_samples))
          + 1j * rng.standard_normal((sched_pulses, opts.num_samples))
          ).astype(np.complex64)
chain = 3


def run_once(fs):
    from nis_sar_amtigmti_video_tpu.utils import cplx

    fn = jax.jit(lambda x: bp_fast.focus_bp_fast(
        x, trajb.positions, trajb.velocities, trajb.times, np.zeros(3),
        float(t0b), p_bp, presum=d_ps, plan=plan_bp, accumulate=bp_acc,
        fit_stride=fs, math_mode="exact"))
    return cplx.to_host(fn(cplx.to_device(raw_np)))


img8 = run_once(8)


def bench(fs, iters=3):
    @jax.jit
    def bp_stream(x):
        img = None
        for _c in range(chain):
            img = bp_fast.focus_bp_fast(
                x, trajb.positions, trajb.velocities, trajb.times,
                np.zeros(3), float(t0b), p_bp, presum=d_ps, plan=plan_bp,
                accumulate=bp_acc, fit_stride=fs, math_mode="exact")
            x = x + (jnp.sum(img[:1, :1]) * 0).astype(x.dtype)
        return x, img

    from nis_sar_amtigmti_video_tpu.utils import cplx
    x, o = bp_stream(cplx.to_device(raw_np))
    _ = float(jnp.sum(jnp.abs(o[:2, :2])))
    lat = []
    for _i in range(iters):
        t1 = time.perf_counter()
        x, o = bp_stream(x)
        _ = float(jnp.sum(jnp.abs(o[:2, :2])))
        lat.append((time.perf_counter() - t1) / chain)
    ms = 1000.0 * float(np.median(lat))
    if fs == 8:
        delta = 0.0
    else:
        img = run_once(fs)
        scale = np.abs(img8).max()
        delta = float(np.abs(img - img8).max() / scale)
    print(f"fit_stride={fs:3d}  {ms:7.1f} ms/frame   "
          f"max|dimg|/peak vs stride8 = {delta:.2e}", flush=True)
    return ms


for fs in (8, 16, 24, 32):
    bench(fs)
