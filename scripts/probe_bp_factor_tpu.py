"""Round-3 probe: factorized (sub-aperture) fast-BP timing on the TPU.

Measures the reference VideoSAR workload (512^2, 2,500 pulses, 22,004
samples, presum 4) per accumulate path as a chained 4-frame stream with one
final sync (the axon RTT-amortized protocol; docs/ROUND2_NOTES.md 8).
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

scv = cfg.videosar()
rv, gv = scv.radar, scv.geometry
sched = 2500
l_ant = videosar.antenna_length_for_swath(scv, scv.processing.bp_scene_size_m)
opts = videosar.spotlight_echo_opts(scv, l_ant)
t0b = window_start_time(gv.slant_range_m, opts, scv.collect.window_length_s,
                        "centered")
p_bp = videosar.bp_params_for(scv, opts, "f32")
d_ps = bp_ops.presum_factor(p_bp, rv.prf_hz, rv.wavelength_m,
                            gv.slant_range_m, gv.effective_velocity_mps)
tb = np.linspace(-sched / rv.prf_hz / 2, sched / rv.prf_hz / 2, sched)
trajb = orbit.make_trajectory(gv, tb)

key = jax.random.PRNGKey(1)
raw = jax.lax.complex(
    jax.random.normal(key, (sched, opts.num_samples), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (sched, opts.num_samples), jnp.float32))

CHAIN = 4
for acc in sys.argv[1:] or ["factor", "xla", "pallas"]:
    plan = bp_fast.make_plan(p_bp, np.asarray(trajb.positions),
                             np.asarray(trajb.times), float(t0b),
                             w_win=64 if "pallas" in acc else 32,
                             factorize=acc.startswith("factor"))

    def one(x, acc=acc, plan=plan):
        img = bp_fast.focus_bp_fast(
            x, trajb.positions, trajb.velocities, trajb.times,
            np.zeros(3), float(t0b), p_bp, presum=d_ps, plan=plan,
            accumulate=acc)
        # chain: feed a touch of the output back so frames serialize
        return x + (jnp.sum(img[:1, :1]) * 0).astype(x.dtype), img

    @jax.jit
    def stream(x):
        for _ in range(CHAIN):
            x, img = one(x)
        return x, img

    x, img = stream(raw)
    s = float(jnp.sum(jnp.abs(img[:2, :2])))          # compile + run
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        x, img = stream(x)
        s = float(jnp.sum(jnp.abs(img[:2, :2])))
        ts.append((time.perf_counter() - t1) / CHAIN)
    print(f"{acc:14s} sub_raw={plan.sub_raw:4d} nx_c={plan.nx_c:4d} "
          f"ny_i={plan.ny_i} nx_i={plan.nx_i} "
          f"frame {1000 * float(np.median(ts)):7.1f} ms", flush=True)
