"""Instrument fast-BP stages: fit residuals + window interp accuracy."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.constants import C
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
from nis_sar_amtigmti_video_tpu.ops import bp_fast
from nis_sar_amtigmti_video_tpu.ops.echo import EchoOpts, phase_history, window_start_time
from nis_sar_amtigmti_video_tpu.ops.interp import interp_uniform
from nis_sar_amtigmti_video_tpu.scene import targets as T
from nis_sar_amtigmti_video_tpu.utils import cplx

sc = cfg.videosar()
g = sc.geometry
n_p = 64
traj = orbit.make_trajectory(g, orbit.slow_time_grid(n_p / 5000.0, n_p))
tgts = T.point_target((0.0, 0.0, 0.0), 30.0)
vel = np.zeros(3)
lam = C / 9.65e9
opts = EchoOpts(fc_hz=9.65e9, chirp_rate=150e6 / 2e-6,
                pulse_width_s=2e-6, fs_hz=180e6, num_samples=1024,
                endpoint_grid=False, chirp_centering="centered",
                amplitude="rcs", stop_and_go=True,
                antenna_length_m=lam * g.slant_range_m / 500.0)
t0 = window_start_time(g.slant_range_m, opts, 1024 / 180e6, "centered")
raw = phase_history(traj, tgts, opts, t_start=t0)

p = bp_ops.BpParams(fc_hz=opts.fc_hz, chirp_rate=opts.chirp_rate,
                    fs_hz=opts.fs_hz, pulse_width_s=opts.pulse_width_s,
                    num_samples=1024, nx=64, ny=64, scene_size_m=400.0,
                    precision="f64")
plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0))
print("plan ny_i nx_i stride band_start:",
      plan.ny_i, plan.nx_i, plan.stride, plan.band_start)

rc = bp_ops.bp_range_compress(raw, p)
pos = jnp.asarray(traj.positions, jnp.float64)
velj = jnp.asarray(traj.velocities, jnp.float64)
ts = jnp.asarray(traj.times, jnp.float64)
vf = jnp.zeros(3, jnp.float64)

rc2, pos2, vel2, t2 = bp_fast.recenter_presum(rc, pos, velj, ts, vf, p, 1,
                                              plan.t_ref)
rdir, cdir, dy_m = bp_fast._frame_geometry(pos2[pos2.shape[0] // 2], p, plan)
u0, pa, pb, pc, b_t, c_t = bp_fast._fit_coeffs(pos2, vel2, t2, vf, p, plan,
                                               jnp.mean(ts), rdir, cdir, dy_m)
u0, pa, pb, pc, b_t, c_t = map(np.asarray, (u0, pa, pb, pc, b_t, c_t))
print("u0 range:", u0.min(), u0.max(), " b_t range:", b_t.min(), b_t.max(),
      " c_t:", c_t.min(), c_t.max())
print("pb range:", pb.min(), pb.max(), " pc:", pc.min(), pc.max())

# ---- check 1: quadratic fit residuals across x for a few (t, y) ----
ny, nx = plan.ny_i, plan.nx_i
b = (jnp.arange(ny, dtype=jnp.float64) - (ny - 1) / 2.0) * dy_m
xi = jnp.arange(nx, dtype=jnp.float64) - (nx - 1) / 2.0
worst_i, worst_p = 0.0, 0.0
for t_i in [0, n_p // 2, n_p - 1]:
    for y_i in [8, ny // 2, ny - 9]:
        gpts = (b[y_i] * cdir)[None, :] + (xi[:, None] * plan.dx_m) * rdir[None, :]
        idx_e, ph_e = bp_fast._idx_phase_exact(
            gpts, pos2[t_i][None, :], vel2[t_i][None, :], vf, p, plan)
        idx_e = np.asarray(idx_e) - (plan.band_start + plan.stride * y_i)
        ph_e = np.asarray(ph_e)
        xif = np.asarray(xi, np.float64)
        idx_fit = u0[t_i, y_i] + b_t[t_i] * xif + c_t[t_i] * xif ** 2
        ph_fit = pa[t_i, y_i] + pb[t_i, y_i] * xif + pc[t_i, y_i] * xif ** 2
        dph = np.angle(np.exp(1j * (ph_fit - ph_e)))
        worst_i = max(worst_i, np.abs(idx_fit - idx_e).max())
        worst_p = max(worst_p, np.abs(dph).max())
print("fit residual: idx", worst_i, "phase", worst_p)

# ---- check 2: window Fourier interp vs linear interp of rc2 ----
img_mach = bp_fast._accumulate(rc2, jnp.asarray(u0), jnp.asarray(pa),
                               jnp.asarray(pb), jnp.asarray(pc),
                               jnp.asarray(b_t), jnp.asarray(c_t), plan)
img_mach = np.asarray(img_mach)

# direct: for every (t,y,x) evaluate exact idx/phase and linear-interp rc2
val = np.zeros((ny, nx), np.complex64)
for t_i in range(n_p):
    gpts = b[:, None, None] * cdir[None, None, :] + (
        xi[None, :, None] * plan.dx_m) * rdir[None, None, :]
    idx_e, ph_e = bp_fast._idx_phase_exact(
        gpts, pos2[t_i][None, None, :], vel2[t_i][None, None, :], vf, p, plan)
    samp = interp_uniform(
        rc2[t_i][None, :],
        jnp.asarray(idx_e, jnp.float32).reshape(1, -1)).reshape(ny, nx)
    ph_w = np.asarray(ph_e)
    ph_w = ph_w - 2 * np.pi * np.round(ph_w / (2 * np.pi))
    val += np.asarray(samp) * np.exp(1j * ph_w).astype(np.complex64)
print("machinery vs direct-linear: max rel",
      np.abs(img_mach - val).max() / np.abs(val).max(),
      " peak mach", np.abs(img_mach).max(), " peak direct", np.abs(val).max())
pk = np.unravel_index(np.abs(val).argmax(), val.shape)
print("peak phase diff:", np.angle(img_mach[pk] * np.conj(val[pk])))

# ---- check 3: direct-internal vs exact backproject output path ----
exact = cplx.to_host(bp_ops.focus_bp(
    rc * 0 + cplx.to_device(cplx.to_host(raw)), traj.positions,
    traj.velocities, traj.times, vel, t0, p))
print("exact peak:", np.abs(exact).max(),
      "internal direct peak:", np.abs(val).max())

# ---- check 4: direct-output (recentred conventions) vs exact focus_bp ----
x_out = np.linspace(-200, 200, 64)
gx, gy = np.meshgrid(x_out, x_out, indexing="xy")
g_out = jnp.asarray(np.stack([gx, gy, np.zeros_like(gx)], axis=-1))
val_out = np.zeros((64, 64), np.complex64)
for t_i in range(n_p):
    idx_e, ph_e = bp_fast._idx_phase_exact(
        g_out, pos2[t_i][None, None, :], vel2[t_i][None, None, :], vf, p, plan)
    samp = interp_uniform(
        rc2[t_i][None, :],
        jnp.asarray(idx_e, jnp.float32).reshape(1, -1)).reshape(64, 64)
    ph_w = np.asarray(ph_e)
    ph_w = ph_w - 2 * np.pi * np.round(ph_w / (2 * np.pi))
    val_out += np.asarray(samp) * np.exp(1j * ph_w).astype(np.complex64)
pk = np.unravel_index(np.abs(exact).argmax(), exact.shape)
print("direct-output vs exact: max rel",
      np.abs(val_out - exact).max() / np.abs(exact).max(),
      "peak phase diff", np.angle(val_out[pk] * np.conj(exact[pk])))

# ---- check 5: resample WITHOUT carrier demod (expected to fail) ----
# The production path demodulates the range carrier before resampling
# (see backproject_fast); this raw call shows why that is required.
res = np.asarray(bp_fast._resample_output(jnp.asarray(img_mach), plan, p, rdir, cdir, dy_m))
print("resampled vs direct-output: max rel",
      np.abs(res - val_out).max() / np.abs(val_out).max(),
      "peak ratio dB",
      20 * np.log10(np.abs(res).max() / np.abs(val_out).max()),
      "peak phase diff", np.angle(res[pk] * np.conj(val_out[pk])))
