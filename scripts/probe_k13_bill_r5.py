"""TPU: attribute K1g and K3g internal bills (round-5 item 3, after the
K2 rows/swap_dot/K4 adoptions took the CPI to ~14.0 ms).

Ablated clones (timing-only; values wrong where noted):
  k1g full / notrig (Phi1 cos/sin -> raw phase) / nobal / nophi (skip
  the Phi1 multiply entirely)
  k3g full / noatan (phase out = raw im) / nobox (col box sums replaced
  by the power plane) / noprod (products replaced by s1 copies; FFT only)
Chained protocol as probe_k2_bill_r5.py (12 iters, one sync).
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


# ---- K1g ablated clone -----------------------------------------------------

def _k1g_abl_body(x1r, x1i, x2r, x2i, u, c1, w, wh, wl, tr_m, ti_m,
                  o1r, o1i, o2r, o2i, obal, *, a, mode, ablate):
    lane = x1r.shape[-1]
    if ablate != "nobal":
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
    else:
        @pl.when(pl.program_id(0) == 0)
        def _zero():
            obal[:] = jnp.zeros((8, 2 * 128), jnp.float32)

    du = u[:] - w[:]
    ph = c1[:] * du * du
    if ablate == "notrig":
        pr1, pi1 = ph, ph
    else:
        pr1, pi1 = jnp.cos(ph), jnp.sin(ph)
    for xr, xi, our, oui in ((x1r, x1i, o1r, o1i), (x2r, x2i, o2r, o2i)):
        sr, si = ck._fft_lead(xr[:], xi[:], wh[:], wl[:], tr_m[:], ti_m[:],
                              jnp.float32(1.0), a, lane, mode,
                              variant="swap")
        if ablate == "nophi":
            our[:], oui[:] = sr, si
        else:
            our[:], oui[:] = ck._cmul(sr, si, pr1, pi1)


def k1g_abl(x1r, x1i, x2r, x2i, ablate):
    n_az, n_rg = x1r.shape
    f_m, t_m = ck._dft_consts(a, n_az)
    from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (blk_lhs,
                                                              split_pair)
    wh, wl = split_pair(blk_lhs(f_m))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    grid = (n_rg // 128,)
    bs_dat = pl.BlockSpec((n_az, 128), lambda j: (0, j))
    bs_u = pl.BlockSpec((1, 128), lambda j: (0, j))
    bs_az = pl.BlockSpec((n_az, 1), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    bs_bal = pl.BlockSpec((8, 2 * 128), lambda j: (0, 0))
    big = jax.ShapeDtypeStruct((n_az, n_rg), jnp.float32)
    with jax.enable_x64(False):
        o = pl.pallas_call(
            partial(_k1g_abl_body, a=a, mode="bf16x3", ablate=ablate),
            grid=grid,
            in_specs=[bs_dat] * 4 + [bs_u, bs_az, bs_az, bs_blk, bs_blk,
                                     bs_c, bs_c],
            out_specs=[bs_dat] * 4 + [bs_bal],
            out_shape=[big] * 4
            + [jax.ShapeDtypeStruct((8, 2 * 128), jnp.float32)],
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=ck._VMEM,
        )(x1r, x1i, x2r, x2i, f.u.reshape(1, -1), f.c1.reshape(-1, 1),
          f.w.reshape(-1, 1), wh, wl, tr_m, ti_m)
    return o[0] + 1e-30 * jnp.sum(o[4][:1, :1]), o[1], o[2], o[3]


base1 = bench("k1g full", lambda *x: k1g_abl(*x, "full"))
for abl in ("notrig", "nobal", "nophi"):
    ms = bench(f"k1g {abl}", lambda *x, abl=abl: k1g_abl(*x, abl))
    print(f"  -> {abl} saves {base1 - ms:6.2f} ms", flush=True)


# ---- K3g ablated clone -----------------------------------------------------

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
    from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (blk_lhs,
                                                              split_pair)
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


base3 = bench("k3g full", lambda *x: k3g_abl(*x, "full"))
for abl in ("noatan", "nobox", "noprod"):
    ms = bench(f"k3g {abl}", lambda *x, abl=abl: k3g_abl(*x, abl))
    print(f"  -> {abl} saves {base3 - ms:6.2f} ms", flush=True)
