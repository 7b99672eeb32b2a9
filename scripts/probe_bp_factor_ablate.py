"""Round-3 probe: ablate the factorized-BP accumulate to locate its cost.

Variants of `_accumulate_factor`'s step (same shapes, same scan):
  full        — committed code
  no_dph      — residual-phase expj replaced by 1 (isolates that trig)
  no_kern     — kern expj replaced by ones (isolates the (t,m,x) trig)
  no_taper    — taper-division marginals replaced by 1
  einsum_only — windows+fft+einsum+merge only (no trig at all)
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
from nis_sar_amtigmti_video_tpu.utils.cplx import expj
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

_TWO_PI = 2.0 * np.pi

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
print("plan ny_i", plan.ny_i, "nx_i", plan.nx_i, "nx_c", plan.nx_c,
      "w", plan.w_win, "sub_p", sub_p, flush=True)

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

ref_conj = bp_fast.matched_filter_spectrum(p, plan.nfft)
rc2, pos2, vel2, t2 = jax.jit(lambda x: bp_fast.recenter_presum(
    x, pos, vel, ts, vf, p, d, plan.t_ref, ref_conj=ref_conj, t_mean=tm))(raw)
rdir, cdir, dy = bp_fast._frame_geometry(
    np.asarray(pos2[pos2.shape[0] // 2]), p, plan)
co = jax.jit(lambda a, b, c: bp_fast._fit_coeffs(
    a, b, c, vf, p, plan, tm, rdir, cdir, dy, fit_stride=8))(pos2, vel2, t2)


def accum(rc2, co, *, dph=True, kern_on=True, taper_on=True):
    u0, pa, pb, pc, b_t, c_t = co
    num_p = rc2.shape[0]
    w = plan.w_win
    ny, nx, nxc = plan.ny_i, plan.nx_i, plan.nx_c
    h = nx / nxc
    f_m = jnp.fft.fftfreq(w).astype(jnp.float32)
    tap = _taper(jnp.arange(w, dtype=jnp.float32), w, plan.taper_pow)
    xi = (jnp.arange(nx, dtype=jnp.float32) - (nx - 1) / 2.0)
    xic = (jnp.arange(nxc, dtype=jnp.float32) - (nxc - 1) / 2.0
           ) * jnp.float32(h)
    u_mat = jnp.asarray(_upsample_matrix(plan))
    band = jax.lax.slice_in_dim(
        rc2, plan.band_start,
        plan.band_start + plan.stride * (ny - 1) + w, 1, axis=1)
    n_sub = -(-num_p // sub_p)
    p_pad = n_sub * sub_p

    def padp(x, edge=False):
        cfg_ = [(0, p_pad - num_p)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg_, mode="edge" if edge else "constant").reshape(
            (n_sub, sub_p) + x.shape[1:])

    ci = jnp.minimum(jnp.arange(n_sub) * sub_p + sub_p // 2, num_p - 1)
    pa_c, pb_c, pc_c = pa[ci], pb[ci], pc[ci]
    w_live = jnp.pad(jnp.ones((num_p,), jnp.float32), (0, p_pad - num_p))
    xs = (padp(band), padp(u0, edge=True), padp(pa, edge=True),
          padp(pb, edge=True), padp(pc, edge=True), padp(b_t, edge=True),
          padp(c_t, edge=True), w_live.reshape(n_sub, sub_p),
          pa_c, pb_c, pc_c)

    def step(img, x):
        (band_b, u0_b, pa_b, pb_b, pc_b, bt_b, ct_b, wl_b,
         pac, pbc, pcc) = x
        win = _extract_windows(band_b, plan)
        w_hat = jnp.fft.fft(win * tap[None, None, :].astype(jnp.complex64),
                            axis=-1) / jnp.float32(w)
        g = w_hat * expj(_TWO_PI * f_m[None, None, :] * u0_b[:, :, None])
        e_t = bt_b[:, None] * xic[None, :] + ct_b[:, None] * xic[None, :] ** 2
        if kern_on:
            kern = expj(_TWO_PI * f_m[None, :, None] * e_t[:, None, :])
        else:
            kern = jnp.ones((sub_p, w, nxc), jnp.complex64)
        val = jnp.einsum("tym,tmx->tyx", g, kern,
                         precision=jax.lax.Precision.HIGHEST)
        if taper_on:
            aa = (jnp.pi / w) * (u0_b + 0.5)
            bb = (jnp.pi / w) * e_t
            s_u = (jnp.sin(aa)[:, :, None] * jnp.cos(bb)[:, None, :]
                   + jnp.cos(aa)[:, :, None] * jnp.sin(bb)[:, None, :])
            t2_ = s_u * s_u
            tp = t2_ * t2_ if plan.taper_pow == 4 \
                else t2_ ** (plan.taper_pow // 2)
            val = val / jnp.maximum(tp, 1e-4)
        if dph:
            d_ph = ((pa_b - pac[None])[:, :, None]
                    + (pb_b - pbc[None])[:, :, None] * xic[None, None, :]
                    + (pc_b - pcc[None])[:, :, None] * xic[None, None, :] ** 2)
            j_s = jnp.sum(val * expj(d_ph) * wl_b[:, None, None], axis=0)
        else:
            j_s = jnp.sum(val * wl_b[:, None, None], axis=0)
        j_up = j_s @ u_mat
        carrier = expj(pac[:, None] + pbc[:, None] * xi[None, :]
                       + pcc[:, None] * xi[None, :] ** 2)
        return img + carrier * j_up, None

    img0 = jnp.zeros((ny, nx), jnp.complex64)
    img, _ = jax.lax.scan(step, img0, xs)
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
        ("full       ", {}),
        ("no_dph     ", {"dph": False}),
        ("no_kern    ", {"kern_on": False}),
        ("no_taper   ", {"taper_on": False}),
        ("einsum_only", {"dph": False, "kern_on": False,
                         "taper_on": False})):
    fn = jax.jit(lambda rc2, co, kw=kw: accum(rc2, co, **kw))
    print(f"{name}: {stream(fn, (rc2, co)):7.1f} ms", flush=True)
