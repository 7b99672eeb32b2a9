"""Round-3 probe: ablate the narrow recentre+presum kernel stage by stage.

Local copy of ops/pallas/fft_kernel.py::_kernel with stages switchable:
  full        — as committed
  no_ramp     — recentre ramp/carrier trig + apply skipped
  no_filter   — matched-filter multiply skipped
  no_twiddle  — both four-step twiddle multiplies skipped
  elementwise0— ALL elementwise skipped (dots + presum only)
  no_dots     — all four MXU dots replaced by pass-throughs (elementwise only)
Run alone on the TPU; ~4-ms dispatch overhead rides every number.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.geometry import orbit
from nis_sar_amtigmti_video_tpu.models import videosar
from nis_sar_amtigmti_video_tpu.ops import bp as bp_ops
from nis_sar_amtigmti_video_tpu.ops import bp_fast
from nis_sar_amtigmti_video_tpu.ops.pallas import fft_kernel as FK
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import roll_half
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

_LANE = 128
_TWO_PI = 2.0 * np.pi


def _kernel(xr, xi, si, sf, car, wl, w1h, w1l, w1ih, w1il, w2h, w2l,
            w2ih, w2il, tw_r, tw_i, a_ref, b_ref, out_r, out_i,
            *, d, groups, nfft, mode, ramp=True, filt=True, twid=True,
            dots=True):
    b1 = nfft // _LANE
    b2 = _LANE

    def dot_l(wh, wl_, z):
        if not dots:
            return z
        dd = partial(jnp.dot, preferred_element_type=jnp.float32)
        zh = z.astype(jnp.bfloat16)
        if mode == "bf16":
            return dd(wh, zh)
        zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dd(wh, zh) + dd(wl_, zh) + dd(wh, zl)

    def dot_m(z, wh, wl_):
        if not dots:
            return z
        dd = partial(jnp.dot, preferred_element_type=jnp.float32)
        zh = z.astype(jnp.bfloat16)
        if mode == "bf16":
            return dd(zh, wh)
        zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dd(zh, wh) + dd(zh, wl_) + dd(zl, wh)

    isgn = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * b2), 1)
    hsgn = jnp.where(isgn >= b2, jnp.float32(1.0), jnp.float32(-1.0))
    m_tab = jnp.where(isgn >= b2, isgn - b2, isgn)
    wrap_mask = m_tab >= b2 // 2

    def forward_spec(t):
        z = jnp.concatenate([xr[t], xi[t]], axis=0)
        y = dot_l(w1h[:], w1l[:], z)
        yr, yi = y[:b1], y[b1:]
        if twid:
            zr = yr * tw_r[:] + yi * tw_i[:]
            zi = yi * tw_r[:] - yr * tw_i[:]
        else:
            zr, zi = yr, yi
        s = jnp.concatenate([zr, zi], axis=1)
        s = dot_m(s, w2h[:], w2l[:])
        if filt:
            s = s * a_ref[:] + roll_half(s) * b_ref[:]
        if ramp:
            si_t = si[t, 0]
            sf_t = sf[t, 0]
            k_io = jax.lax.broadcasted_iota(jnp.int32, (b1, 1), 0)
            pha_i = (k_io * si_t) % nfft
            pha = (_TWO_PI / nfft) * (pha_i.astype(jnp.float32)
                                      + sf_t * k_io.astype(jnp.float32)) \
                + car[t, 0]
            ar, ai = jnp.cos(pha), jnp.sin(pha)
            mb = m_tab * b1
            phb_i = b1 * ((m_tab * si_t) % b2)
            phb = (_TWO_PI / nfft) * (phb_i.astype(jnp.float32)
                                      + sf_t * mb.astype(jnp.float32))
            br, bi = jnp.cos(phb), jnp.sin(phb)
            cs = ar * br - ai * bi
            sn = ar * bi + ai * br
            phc = -_TWO_PI * sf_t
            cr, ci_ = jnp.cos(phc), jnp.sin(phc)
            cs, sn = (jnp.where(wrap_mask, cs * cr - sn * ci_, cs),
                      jnp.where(wrap_mask, cs * ci_ + sn * cr, sn))
            s = s * cs + roll_half(s) * (sn * hsgn)
        return s * (wl[t, 0] / d)

    for g in range(groups):
        def body(j, acc):
            return acc + forward_spec(g * d + j)
        s = jax.lax.fori_loop(0, d, body,
                              jnp.zeros((b1, 2 * b2), jnp.float32))
        s = dot_m(s, w2ih[:], w2il[:])
        if twid:
            a2 = jnp.concatenate([tw_r[:], tw_r[:]], axis=1)
            b2t = jnp.concatenate([tw_i[:], tw_i[:]], axis=1) * hsgn
            s = s * a2 + roll_half(s) * b2t
        z2 = jnp.concatenate([s[:, :b2], s[:, b2:]], axis=0)
        y2 = dot_l(w1ih[:], w1il[:], z2)
        out_r[g] = y2[:b1]
        out_i[g] = y2[b1:]


def run(rc, sat_pos, sat_vel, t_slow, vel_focus, p, d, t_ref, groups=2,
        mode="bf16x3", t_mean=None, **abl):
    num_p, ns = rc.shape
    nfft = 1 << (ns - 1).bit_length()
    b1 = nfft // _LANE
    dt = t_slow - t_mean
    org = vel_focus[None, :] * dt[:, None]
    d0 = jnp.linalg.norm(sat_pos - org, axis=1)
    blk = d * groups
    p_pad = -(-num_p // blk) * blk
    wl = jnp.pad(jnp.ones((num_p,), jnp.float32),
                 (0, p_pad - num_p)).reshape(-1, 1)
    rc_p = jnp.pad(rc, ((0, p_pad - num_p), (0, nfft - ns)))
    d0_p = jnp.pad(d0, (0, p_pad - num_p), mode="edge")
    shift = (2.0 * d0_p / 299792458.0 - t_ref) * p.fs_hz
    si = jnp.round(shift)
    sf = (shift - si).astype(jnp.float32).reshape(-1, 1)
    si = jnp.mod(si, nfft).astype(jnp.int32).reshape(-1, 1)
    car = _TWO_PI * (2.0 * p.fc_hz / 299792458.0) * d0_p
    car = (car - _TWO_PI * jnp.round(car / _TWO_PI)
           ).astype(jnp.float32).reshape(-1, 1)
    ref = bp_fast.matched_filter_spectrum(p, nfft)
    (w1h, w1l), (w1ih, w1il), (w2h, w2l), (w2ih, w2il), tw_r, tw_i, \
        a_ref, b_ref = FK._tables(nfft, ref)
    xr = jnp.real(rc_p).astype(jnp.float32).reshape(p_pad, b1, _LANE)
    xi = jnp.imag(rc_p).astype(jnp.float32).reshape(p_pad, b1, _LANE)
    n_out = p_pad // d
    grid = (p_pad // blk,)
    bs_in = pl.BlockSpec((blk, b1, _LANE), lambda i: (i, 0, 0))
    bs_sc = pl.BlockSpec((blk, 1), lambda i: (i, 0))
    bs_w1 = pl.BlockSpec((2 * b1, 2 * b1), lambda i: (0, 0))
    bs_w2 = pl.BlockSpec((2 * _LANE, 2 * _LANE), lambda i: (0, 0))
    bs_tw = pl.BlockSpec((b1, _LANE), lambda i: (0, 0))
    bs_f = pl.BlockSpec((b1, 2 * _LANE), lambda i: (0, 0))
    bs_out = pl.BlockSpec((groups, b1, _LANE), lambda i: (i, 0, 0))
    with jax.enable_x64(False):
        our, oui = pl.pallas_call(
            partial(_kernel, d=d, groups=groups, nfft=nfft, mode=mode, **abl),
            grid=grid,
            in_specs=[bs_in, bs_in, bs_sc, bs_sc, bs_sc, bs_sc,
                      bs_w1, bs_w1, bs_w1, bs_w1, bs_w2, bs_w2, bs_w2, bs_w2,
                      bs_tw, bs_tw, bs_f, bs_f],
            out_specs=[bs_out, bs_out],
            out_shape=[jax.ShapeDtypeStruct((n_out, b1, _LANE), jnp.float32)]
            * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(xr, xi, si, sf, car, wl, w1h, w1l, w1ih, w1il, w2h, w2l,
          w2ih, w2il, tw_r, tw_i, a_ref, b_ref)
    return jax.lax.complex(our, oui).reshape(n_out, nfft)


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
plan = bp_fast.make_plan(p, traj.positions, traj.times, float(t0))
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


for name, kw in (
        ("full       ", {}),
        ("no_ramp    ", {"ramp": False}),
        ("no_filter  ", {"filt": False}),
        ("no_twiddle ", {"twid": False}),
        ("elementwise0", {"ramp": False, "filt": False, "twid": False}),
        ("no_dots    ", {"dots": False})):
    fn = jax.jit(lambda x, kw=kw: run(x, pos, vel, ts, vf, p, d, plan.t_ref,
                                      t_mean=tm, **kw))
    print(f"{name}: {stream(fn, (raw,)):7.1f} ms", flush=True)
