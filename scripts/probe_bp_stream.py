"""Round-3 probe: streaming fast-BP split at reference VideoSAR scale.

The 80%-overlap product shares each pulse across ~5 frames, so the
forward half of the recentre pass (four-step FFT + matched filter) can be
cached per pulse (ops/pallas/fft_kernel.py::forward_spectra_pallas). Rows:

  full frame   — focus_bp_fast on raw pulses (the committed per-frame path)
  stream frame — forward_spectra on the 500 NEW pulses + focus from the
                 cached 2,500-pulse spectra window (the amortized cost a
                 10 fps stream actually pays per frame)
  fwd-only     — forward_spectra on 2,500 pulses (the cacheable half alone)

Each chained 3x with one host-fetch sync (ROUND2_NOTES §1 protocol).
"""

import os
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
step = 500
acc = os.environ.get("PROBE_BP_ACC", "factor_pallas")
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


def timed(fn, *args):
    """One warm run then one timed run; each jitted fn chains 3 frames
    internally, so callers divide the result by 3."""
    out = fn(*args)
    lead = out[-1] if isinstance(out, tuple) else out
    float(jnp.sum(jnp.abs(lead[:1, :1])))
    t1 = time.perf_counter()
    out = fn(*args)
    lead = out[-1] if isinstance(out, tuple) else out
    float(jnp.sum(jnp.abs(lead[:1, :1])))
    return time.perf_counter() - t1


@jax.jit
def full_frame(x):
    img = None
    for _ in range(3):
        img = bp_fast.focus_bp_fast(x, traj.positions, traj.velocities,
                                    traj.times, np.zeros(3), float(t0), p,
                                    presum=d, plan=plan, accumulate=acc,
                                    fit_stride=8)
        x = x + (jnp.sum(img[:1, :1]) * 0).astype(x.dtype)
    return x, img


@jax.jit
def fwd_only(x):
    s = None
    for _ in range(3):
        s = bp_fast.forward_spectra(x, p)
        x = x + (jnp.sum(s[:1, :1, :1]) * 0).astype(x.dtype)
    return x, s[:, :, :128]


@jax.jit
def stream_frame(spec_buf, new_raw):
    img = None
    for _ in range(3):
        new_spec = bp_fast.forward_spectra(new_raw, p)
        spec_buf = jnp.concatenate([spec_buf[step:], new_spec], axis=0)
        img = bp_fast.focus_bp_fast(None, traj.positions, traj.velocities,
                                    traj.times, np.zeros(3), float(t0), p,
                                    presum=d, plan=plan, accumulate=acc,
                                    fit_stride=8, raw_spectra=spec_buf)
        new_raw = new_raw + (jnp.sum(img[:1, :1]) * 0).astype(new_raw.dtype)
    return spec_buf, img


@jax.jit
def stream_frame_ring(spec_buf, wp, new_raw):
    """Ring variant: the buffer advances by dynamic_update_slice (131 MB
    written/step) instead of the full-window concat (~655 MB RW/frame);
    ring_offset rolls only the tiny scalars + the 9 MB presummed rows."""
    img = None
    for _ in range(3):
        new_spec = bp_fast.forward_spectra(new_raw, p)
        zero = jnp.zeros((), wp.dtype)
        spec_buf = jax.lax.dynamic_update_slice(spec_buf, new_spec,
                                                (wp, zero, zero))
        wp = (wp + step) % sched
        img = bp_fast.focus_bp_fast(None, traj.positions, traj.velocities,
                                    traj.times, np.zeros(3), float(t0), p,
                                    presum=d, plan=plan, accumulate=acc,
                                    fit_stride=8, raw_spectra=spec_buf,
                                    ring_offset=wp)
        new_raw = new_raw + (jnp.sum(img[:1, :1]) * 0).astype(new_raw.dtype)
    return spec_buf, wp, img


print(f"acc={acc} d={d} plan nfft={plan.nfft} sub_raw={plan.sub_raw}",
      flush=True)
t_full = timed(full_frame, raw) / 3
print(f"full frame  : {1000 * t_full:8.1f} ms", flush=True)
t_fwd = timed(fwd_only, raw) / 3
print(f"fwd 2500    : {1000 * t_fwd:8.1f} ms", flush=True)
spec0 = bp_fast.forward_spectra(raw, p)
float(jnp.sum(jnp.abs(spec0[:1, :1, :1])))
t_str = timed(stream_frame, spec0, raw[:step]) / 3
print(f"stream frame: {1000 * t_str:8.1f} ms "
      f"({1000 / max(t_str, 1e-9) / 1000:.1f} fps amortized)", flush=True)
try:
    t_ring = timed(stream_frame_ring, spec0, jnp.int32(0), raw[:step]) / 3
    print(f"ring frame  : {1000 * t_ring:8.1f} ms "
          f"({1000 / max(t_ring, 1e-9) / 1000:.1f} fps amortized)",
          flush=True)
    # equality spot check: one ring step vs one concat step (same inputs)
    sb_c, img_c = stream_frame(spec0, raw[:step])
    sb_r, _, img_r = stream_frame_ring(spec0, jnp.int32(0), raw[:step])
    e = float(jnp.max(jnp.abs(img_r - img_c)) / jnp.max(jnp.abs(img_c)))
    print(f"ring vs concat rel-err: {e:.2e}", flush=True)
except Exception as ex:                    # keep the other rows on failure
    print(f"ring frame  : FAILED {type(ex).__name__}: {ex}", flush=True)
