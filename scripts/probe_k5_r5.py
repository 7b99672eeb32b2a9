"""TPU: round-5 follow-ups to probe_k13_bill_r5.py.

k13 found: K1g full 4.66 ms, Phi1 multiply 1.02 ms of it (0.80 trig) —
and Phi1 is data-independent, so a precomputed (n_az, n_rg) cos/sin
table read (~0.16 ms HBM) should beat the in-kernel trig. K3g's rows
crashed on a missing enable_x64 guard — fixed here. Also isolated
lead-variant A/Bs (the earlier full-CPI 'dots' loss conflated K1g+K3g).
"""
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel as ck
from nis_sar_amtigmti_video_tpu.ops.pallas import gmti_kernel as gk
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import blk_lhs, split_pair

print("device:", jax.devices()[0])
size = 4096
sc = cfg.videosar()
g, r = sc.geometry, sc.radar
t0 = window_start_time(g.slant_range_m, None, sc.collect.window_length_s,
                       "centered")
p = csa_ops.CsaParams(
    wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
    prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
    range_ref_m=g.slant_range_m, t_start_fast=t0,
    num_pulses=size, num_samples=size)
f = csa_ops.csa_factors(p)
a = int(math.isqrt(size))
host = [np.random.default_rng(i).standard_normal((size, size), np.float32)
        for i in range(4)]


def fresh():
    return tuple(jnp.asarray(x) for x in host)


def bench(name, fn, iters=12):
    try:
        fnj = jax.jit(fn, donate_argnums=(0, 1, 2, 3))
        out = fnj(*fresh())
        _ = float(jnp.sum(out[0][:1, :1]))
        t1 = time.perf_counter()
        for _ in range(iters):
            out = fnj(*out[:4])
        _ = float(jnp.sum(out[0][:1, :1]))
        ms = 1000.0 * (time.perf_counter() - t1) / iters
        print(f"{name:30s} {ms:8.2f} ms", flush=True)
        return ms
    except Exception as e:  # noqa: BLE001 — probe keeps going
        print(f"{name:30s} FAILED: {str(e)[:140]}", flush=True)
        return float("nan")


# ---- K1g with a precomputed Phi1 table -------------------------------------

def _k1gt_body(x1r, x1i, x2r, x2i, pcs, psn, wh, wl, tr_m, ti_m,
               o1r, o1i, o2r, o2i, obal, *, a, mode, variant):
    lane = x1r.shape[-1]
    pr = x1r[:] * x2r[:] + x1i[:] * x2i[:]
    pi = x1i[:] * x2r[:] - x1r[:] * x2i[:]
    row = jnp.concatenate([jnp.sum(pr, axis=0, keepdims=True),
                           jnp.sum(pi, axis=0, keepdims=True)], axis=1)
    blk = jnp.broadcast_to(row, (8, 2 * 128)) * jnp.float32(0.125)
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        obal[:] = blk

    @pl.when(j != 0)
    def _acc():
        obal[:] = obal[:] + blk

    pr1, pi1 = pcs[:], psn[:]
    for xr, xi, our, oui in ((x1r, x1i, o1r, o1i), (x2r, x2i, o2r, o2i)):
        sr, si = ck._fft_lead(xr[:], xi[:], wh[:], wl[:], tr_m[:], ti_m[:],
                              jnp.float32(1.0), a, lane, mode,
                              variant=variant)
        our[:], oui[:] = ck._cmul(sr, si, pr1, pi1)


ph1 = (jnp.asarray(f.c1).reshape(-1, 1)
       * (jnp.asarray(f.u).reshape(1, -1)
          - jnp.asarray(f.w).reshape(-1, 1)) ** 2).astype(jnp.float32)
PCS = jnp.cos(ph1)
PSN = jnp.sin(ph1)


def k1g_table(x1r, x1i, x2r, x2i, variant="swap"):
    n_az, n_rg = x1r.shape
    f_m, t_m = ck._dft_consts(a, n_az)
    wh, wl = split_pair(blk_lhs(f_m))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    grid = (n_rg // 128,)
    bs_dat = pl.BlockSpec((n_az, 128), lambda j: (0, j))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    bs_bal = pl.BlockSpec((8, 2 * 128), lambda j: (0, 0))
    big = jax.ShapeDtypeStruct((n_az, n_rg), jnp.float32)
    with jax.enable_x64(False):
        o = pl.pallas_call(
            partial(_k1gt_body, a=a, mode="bf16x3", variant=variant),
            grid=grid,
            in_specs=[bs_dat] * 6 + [bs_blk, bs_blk, bs_c, bs_c],
            out_specs=[bs_dat] * 4 + [bs_bal],
            out_shape=[big] * 4
            + [jax.ShapeDtypeStruct((8, 2 * 128), jnp.float32)],
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=ck._VMEM,
        )(x1r, x1i, x2r, x2i, PCS, PSN, wh, wl, tr_m, ti_m)
    return o[0] + 1e-30 * jnp.sum(o[4][:1, :1]), o[1], o[2], o[3]


def k1g_lib(x1r, x1i, x2r, x2i, variant="swap"):
    with jax.enable_x64(False):
        z1r, z1i, z2r, z2i, xs_re, xs_im = gk.k1_gmti_planes(
            x1r, x1i, x2r, x2i, f, lead_variant=variant)
    return z1r + 1e-30 * xs_re, z1i, z2r, z2i


if os.environ.get("K5_SKIP_K1", "0") != "1":
    bench("k1g lib swap (trig)", k1g_lib)
    bench("k1g TABLE swap", k1g_table)
    bench("k1g lib dots (trig)", lambda *x: k1g_lib(*x, variant="dots"))
    bench("k1g TABLE dots", lambda *x: k1g_table(*x, variant="dots"))


# ---- K3g ablations (x64 guard fixed) + lead variants -----------------------

def k3g_lib(x1r, x1i, x2r, x2i, variant="swap"):
    cal = jnp.asarray([[1.0, 0.0]], jnp.float32)
    o = gk.k3_gmti_planes(x1r, x1i, x2r, x2i, cal, h_out=10, h_in=2,
                          lead_variant=variant)
    return o[0] + 1e-30 * jnp.sum(o[4][:1, :1] + o[6][:1, :1]
                                  + o[7][:1, :1] + o[8][:1, :1]), \
        o[1], o[2], o[3]


def _k3g_abl_body(x1r, x1i, x2r, x2i, cal, wh, wl, tr_m, ti_m,
                  o1r, o1i, o2r, o2i, oph, omg, opw, ocso, ocsi, opk,
                  *, a, mode, h_out, h_in, ablate):
    lane = x1r.shape[-1]
    neg = jnp.float32(-1.0)
    s1r, s1i = ck._fft_lead(x1r[:], x1i[:], wh[:], wl[:], tr_m[:], ti_m[:],
                            neg, a, lane, mode, variant="swap")
    s2r, s2i = ck._fft_lead(x2r[:], x2i[:], wh[:], wl[:], tr_m[:], ti_m[:],
                            neg, a, lane, mode, variant="swap")
    o1r[:], o1i[:] = s1r, s1i
    o2r[:], o2i[:] = s2r, s2i
    j = pl.program_id(0)
    if ablate == "noprod":
        oph[:] = s1r
        omg[:] = s1i
        opw[:] = s2r
        ocso[:] = s2i
        ocsi[:] = s1r

        @pl.when(j == 0)
        def _z():
            opk[:] = jnp.zeros((8, 128), jnp.float32)
        return

    cr = cal[0, 0:1]
    ci = cal[0, 1:2]
    pr = s1r * s2r + s1i * s2i
    pi = s1i * s2r - s1r * s2i
    ir_ = pr * cr + pi * ci
    ii_ = pi * cr - pr * ci
    oph[:] = ii_ if ablate == "noatan" else gk._atan2(ii_, ir_)
    mag = s1r * s1r + s1i * s1i
    omg[:] = mag
    m = jnp.max(mag)

    @pl.when(j == 0)
    def _init():
        opk[:] = jnp.full((8, 128), m, jnp.float32)

    @pl.when(j != 0)
    def _acc():
        opk[:] = jnp.maximum(opk[:], m)

    dr_ = s1r - (s2r * cr - s2i * ci)
    di_ = s1i - (s2r * ci + s2i * cr)
    pw = dr_ * dr_ + di_ * di_
    opw[:] = pw
    if ablate == "nobox":
        ocso[:] = pw
        ocsi[:] = pw
    else:
        ocso[:] = gk._col_box(pw, h_out)
        ocsi[:] = gk._col_box(pw, h_in)


def k3g_abl(x1r, x1i, x2r, x2i, ablate):
    n_rg = x1r.shape[-1]
    n = a * a
    f_m, t_m = ck._dft_consts(a, n)
    inv = np.conj(f_m).T / a
    wh, wl = split_pair(blk_lhs(inv))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    cal = jnp.asarray([[1.0, 0.0]], jnp.float32)
    grid = (n_rg // 128,)
    bs_dat = pl.BlockSpec((n, 128), lambda j: (0, j))
    bs_cal = pl.BlockSpec((1, 2), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    bs_pk = pl.BlockSpec((8, 128), lambda j: (0, 0))
    big = jax.ShapeDtypeStruct((n, n_rg), jnp.float32)
    with jax.enable_x64(False):
        o = pl.pallas_call(
            partial(_k3g_abl_body, a=a, mode="bf16x3", h_out=10, h_in=2,
                    ablate=ablate),
            grid=grid,
            in_specs=[bs_dat] * 4 + [bs_cal, bs_blk, bs_blk, bs_c, bs_c],
            out_specs=[bs_dat] * 9 + [bs_pk],
            out_shape=[big] * 9
            + [jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=gk._VMEM,
        )(x1r, x1i, x2r, x2i, cal, wh, wl, tr_m, ti_m)
    return o[0] + 1e-30 * jnp.sum(o[4][:1, :1] + o[6][:1, :1]
                                  + o[7][:1, :1] + o[8][:1, :1]), \
        o[1], o[2], o[3]


base3 = bench("k3g lib swap", k3g_lib)
bench("k3g lib dots", lambda *x: k3g_lib(*x, variant="dots"))
for abl in ("full", "noatan", "nobox", "noprod"):
    ms = bench(f"k3g clone {abl}",
               lambda *x, abl=abl: k3g_abl(*x, abl))
    print(f"  -> vs lib {base3 - ms:6.2f} ms", flush=True)
