"""Round-3 probe: split the factor-accumulate's 20-ms 'base' cost.

Variants (all trig off, same scan structure, same shapes):
  base         — windows + taper-mult + fft(32) + einsum(tyx) + t-sum + merge
  dft_mat      — fft(32) replaced by a (w,w) DFT matmul on the MXU
  fused_yx     — single einsum 'tym,tmx->yx' (no (t,y,x) intermediate)
  fused_dft    — both: DFT matmul + fused t-sum einsum
  windows_only — extract windows, taper-mult, sum (traffic floor)
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
from nis_sar_amtigmti_video_tpu.ops.bp_fast import (_extract_windows,
                                                    _taper, _upsample_matrix)
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
print("plan ny_i", plan.ny_i, "nx_i", plan.nx_i, "nx_c", plan.nx_c,
      "w", plan.w_win, "sub_p", sub_p, "P2", num_p2, flush=True)

key = jax.random.PRNGKey(1)
rc2 = jax.lax.complex(
    jax.random.normal(key, (num_p2, plan.nfft), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (num_p2, plan.nfft), jnp.float32))

w = plan.w_win
ny, nx, nxc = plan.ny_i, plan.nx_i, plan.nx_c
tap = np.asarray(_taper(jnp.arange(w, dtype=jnp.float32), w, plan.taper_pow))
u_mat = jnp.asarray(_upsample_matrix(plan))
F = np.fft.fft(np.eye(w)).astype(np.complex64) / w   # DFT as matmul


def accum(rc2, *, dft=False, fused=False):
    band = jax.lax.slice_in_dim(
        rc2, plan.band_start,
        plan.band_start + plan.stride * (ny - 1) + w, 1, axis=1)
    num_p = rc2.shape[0]
    n_sub = -(-num_p // sub_p)
    p_pad = n_sub * sub_p
    band_p = jnp.pad(band, ((0, p_pad - num_p), (0, 0))).reshape(
        (n_sub, sub_p, -1))
    kern = jax.lax.complex(
        jax.random.normal(jax.random.PRNGKey(3), (sub_p, w, nxc),
                          jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4), (sub_p, w, nxc),
                          jnp.float32))
    Fj = jnp.asarray(F)
    tapj = jnp.asarray(tap).astype(jnp.complex64)

    def step(img, band_b):
        win = _extract_windows(band_b, plan) * tapj[None, None, :]
        if dft:
            w_hat = jnp.einsum("tys,sm->tym", win, Fj,
                               precision=jax.lax.Precision.HIGHEST)
        else:
            w_hat = jnp.fft.fft(win, axis=-1) / jnp.float32(w)
        if fused:
            j_s = jnp.einsum("tym,tmx->yx", w_hat, kern,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            val = jnp.einsum("tym,tmx->tyx", w_hat, kern,
                             precision=jax.lax.Precision.HIGHEST)
            j_s = jnp.sum(val, axis=0)
        return img + j_s @ u_mat, None

    img0 = jnp.zeros((ny, nx), jnp.complex64)
    img, _ = jax.lax.scan(step, img0, band_p)
    return img


def windows_only(rc2):
    band = jax.lax.slice_in_dim(
        rc2, plan.band_start,
        plan.band_start + plan.stride * (ny - 1) + w, 1, axis=1)
    num_p = rc2.shape[0]
    n_sub = -(-num_p // sub_p)
    p_pad = n_sub * sub_p
    band_p = jnp.pad(band, ((0, p_pad - num_p), (0, 0))).reshape(
        (n_sub, sub_p, -1))
    tapj = jnp.asarray(tap).astype(jnp.complex64)

    def step(img, band_b):
        win = _extract_windows(band_b, plan) * tapj[None, None, :]
        return img + jnp.sum(win, axis=0), None

    img0 = jnp.zeros((ny, w), jnp.complex64)
    img, _ = jax.lax.scan(step, img0, band_p)
    return img


def stream(fn, args, n=4):
    out = fn(*args)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jnp.abs(out[:1, :1])))
    return 1000 * (time.perf_counter() - t1) / n


for name, kw in (
        ("base       ", {}),
        ("dft_mat    ", {"dft": True}),
        ("fused_yx   ", {"fused": True}),
        ("fused_dft  ", {"dft": True, "fused": True})):
    fn = jax.jit(lambda rc2, kw=kw: accum(rc2, **kw))
    print(f"{name}: {stream(fn, (rc2,)):7.1f} ms", flush=True)
fn = jax.jit(windows_only)
print(f"windows_only: {stream(fn, (rc2,)):7.1f} ms", flush=True)
