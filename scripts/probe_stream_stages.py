"""Round-3 probe: where does the streaming BP split's time go?

probe_bp_stream measured stream frame 37.0 ms vs full 39.7 while the
cacheable forward half costs 17.4 ms — ~11 ms of the expected saving is
lost inside the split. Rows (each chained 3x in one jit, one host-fetch
sync):

  fwd 500        — forward_spectra on the per-frame NEW pulses
  concat         — the sliding spectra-window update alone (655 MB copy)
  inv groups=g   — recentre_from_spectra_pallas alone (ramp + presum +
                   band-limited inverse) for groups in {2, 4, 8}
  rest (no rec)  — fit + accumulate + finalize from a precomputed rc2
  stream frame   — the whole split (reference row)

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
step = 500
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
print(f"plan nfft={plan.nfft} band rows [{p0}, {p1}) of {plan.nfft // 128}",
      flush=True)

key = jax.random.PRNGKey(1)
raw = jax.lax.complex(
    jax.random.normal(key, (sched, opts.num_samples), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (sched, opts.num_samples), jnp.float32))
spec0 = bp_fast.forward_spectra(raw, p)
float(jnp.sum(jnp.abs(spec0[:1, :1, :1])))
print(f"spectra buffer: {spec0.shape} {spec0.dtype} "
      f"({spec0.size * spec0.dtype.itemsize / 1e6:.0f} MB)", flush=True)


def timed(fn, *args, n=3):
    out = fn(*args)
    lead = out[-1] if isinstance(out, tuple) else out
    float(jnp.sum(jnp.abs(lead[:1, :1])))
    t1 = time.perf_counter()
    out = fn(*args)
    lead = out[-1] if isinstance(out, tuple) else out
    float(jnp.sum(jnp.abs(lead[:1, :1])))
    return 1000 * (time.perf_counter() - t1) / n


def chain3(body):
    @jax.jit
    def run(x):
        o = None
        for _ in range(3):
            o = body(x)
            lead = o[0] if isinstance(o, tuple) else o
            x = x + (jnp.sum(jnp.abs(lead[:1, :1])) * 0).astype(x.dtype)
        return x, o if not isinstance(o, tuple) else o[0]
    return run


t_f5 = timed(chain3(lambda x: bp_fast.forward_spectra(x, p)), raw[:step])
print(f"fwd 500          : {t_f5:7.1f} ms", flush=True)

t_cc = timed(chain3(lambda s: jnp.concatenate(
    [s[step:], s[:step]], axis=0)), spec0)
print(f"concat           : {t_cc:7.1f} ms", flush=True)


def inv_only(groups):
    def body(s):
        rc2, _, _, _ = fft_kernel.recentre_from_spectra_pallas(
            s, traj.positions, traj.velocities, traj.times,
            np.zeros(3), p, max(1, d), plan.t_ref,
            out_rows=(p0, p1), mode="bf16x3", groups=groups)
        return rc2
    return chain3(body)


for grp in (2, 4, 5, 8):   # blk=d*grp: only grp=5 divides 2500 (no pad copy)
    print(f"inv groups={grp}     : {timed(inv_only(grp), spec0):7.1f} ms",
          flush=True)

# rest-of-frame from a precomputed rc2: focus minus the recentre pass
rc2_0, pos2, vel2, t2 = fft_kernel.recentre_from_spectra_pallas(
    spec0, traj.positions, traj.velocities, traj.times, np.zeros(3),
    p, max(1, d), plan.t_ref, out_rows=(p0, p1))
float(jnp.sum(jnp.abs(rc2_0[:1, :1])))
import dataclasses
plan_acc = dataclasses.replace(plan, band_start=plan.band_start - p0 * 128)


def rest_body(rc2):
    rdir, cdir, dy_m = bp_fast._frame_geometry(
        pos2[pos2.shape[0] // 2], p, plan)
    u0, pa, pb_, pc, b_t, c_t = bp_fast._fit_coeffs(
        pos2, vel2, t2, np.zeros(3), p, plan, float(np.mean(t2)),
        rdir, cdir, dy_m, fit_stride=8)
    img_i = bp_fast._accumulate_factor(rc2, u0, pa, pb_, pc, b_t, c_t,
                                       plan_acc, "factor_pallas")
    return bp_fast._resample_output(img_i, plan, p, rdir, cdir, dy_m)


print(f"rest (fit+acc+fin): {timed(chain3(rest_body), rc2_0):7.1f} ms",
      flush=True)


@jax.jit
def stream_frame(spec_buf, new_raw):
    img = None
    for _ in range(3):
        new_spec = bp_fast.forward_spectra(new_raw, p)
        spec_buf = jnp.concatenate([spec_buf[step:], new_spec], axis=0)
        img = bp_fast.focus_bp_fast(None, traj.positions, traj.velocities,
                                    traj.times, np.zeros(3), float(t0), p,
                                    presum=d, plan=plan,
                                    accumulate="factor_pallas",
                                    fit_stride=8, raw_spectra=spec_buf)
        new_raw = new_raw + (jnp.sum(img[:1, :1]) * 0).astype(new_raw.dtype)
    return spec_buf, img


out = stream_frame(spec0, raw[:step])
float(jnp.sum(jnp.abs(out[1][:1, :1])))
t1 = time.perf_counter()
out = stream_frame(spec0, raw[:step])
float(jnp.sum(jnp.abs(out[1][:1, :1])))
print(f"stream frame     : {1000 * (time.perf_counter() - t1) / 3:7.1f} ms",
      flush=True)
