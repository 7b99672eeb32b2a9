"""Round-3 probe: cost of _window_spectra (strided-conv window DFT) alone,
vs the layout-poisoned _extract_windows path it replaced, at reference
scale (same scan structure as the accumulate).
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
num_p2 = -(-sched // d)
ny, w = plan.ny_i, plan.w_win

key = jax.random.PRNGKey(1)
rc2 = jax.lax.complex(
    jax.random.normal(key, (num_p2, plan.nfft), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (num_p2, plan.nfft), jnp.float32))


def scan_steps(rc2, fn_step, out_shape):
    band = jax.lax.slice_in_dim(
        rc2, plan.band_start,
        plan.band_start + plan.stride * (ny - 1) + w, 1, axis=1)
    n_sub = -(-num_p2 // sub_p)
    band_p = jnp.pad(band, ((0, n_sub * sub_p - num_p2), (0, 0))).reshape(
        (n_sub, sub_p, -1))

    def step(img, band_b):
        return img + fn_step(band_b), None

    img, _ = jax.lax.scan(step, jnp.zeros(out_shape, jnp.complex64), band_p)
    return img


def stream(fn, n=4):
    out = fn(rc2)
    float(jnp.sum(jnp.abs(out.reshape(-1)[:1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(rc2)
    float(jnp.sum(jnp.abs(out.reshape(-1)[:1])))
    return 1000 * (time.perf_counter() - t1) / n


conv = jax.jit(lambda rc2: scan_steps(
    rc2, lambda b: jnp.sum(bp_fast._window_spectra(b, plan), axis=0),
    (w, ny)))
print(f"conv spectra  : {stream(conv):7.1f} ms", flush=True)


def old_step(b):
    tap = bp_fast._taper(jnp.arange(w, dtype=jnp.float32), w, plan.taper_pow
                         ).astype(jnp.complex64)
    return jnp.sum(jnp.fft.fft(
        bp_fast._extract_windows(b, plan) * tap[None, None, :], axis=-1),
        axis=0) / jnp.float32(w)


old = jax.jit(lambda rc2: scan_steps(rc2, old_step, (ny, w)))
print(f"old extract+fft: {stream(old):7.1f} ms", flush=True)

# conv + ramp + einsum to val (the full front half of the factor step)
f_m = np.fft.fftfreq(w).astype(np.float32)
rng = np.random.default_rng(5)
u0b = rng.standard_normal((sub_p, ny)).astype(np.float32)
kern_np = (rng.standard_normal((sub_p, w, plan.nx_c))
           + 1j * rng.standard_normal((sub_p, w, plan.nx_c))
           ).astype(np.complex64)
from nis_sar_amtigmti_video_tpu.utils.cplx import expj


def front(b):
    g = bp_fast._window_spectra(b, plan) * expj(
        2.0 * np.pi * jnp.asarray(f_m)[None, :, None]
        * jnp.asarray(u0b)[:, None, :])
    val = jnp.einsum("tmy,tmx->tyx", g, jnp.asarray(kern_np),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(val, axis=0)


fr = jax.jit(lambda rc2: scan_steps(rc2, front, (ny, plan.nx_c)))
print(f"conv+ramp+einsum: {stream(fr):7.1f} ms", flush=True)
