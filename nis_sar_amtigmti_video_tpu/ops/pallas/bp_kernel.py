"""Pallas TPU tile kernel for fast-BP accumulation (the SURVEY §3
"pixel/tile parallel" kernel: pixel tiles in VMEM, pulses streamed).

ops/bp_fast.py::_accumulate is the XLA version: per pulse block it
materializes (B, ny, W) window spectra and (B, ny, nx) value/phase fields
in HBM between fusions. This kernel keeps one (TY, nx) pixel tile resident
in VMEM and streams pulse blocks over it, fusing the whole per-pulse chain

    windows -> tapered W-point DFT -> window-offset ramp ->
    column Fourier kernel matmul -> taper division -> focusing phase ->
    accumulate

with no HBM traffic beyond reading each input window once and one final
tile write. Both contractions are FULL-WIDTH (128-lane) MXU dots — the
W = 64 complex window packs to a (128, 128) real block DFT, and the
column kernel to (128, 2*nx) — following the lane-packing discipline of
ops/pallas/csa_kernel.py (64-wide dots are ~40x slower; its module
docstring has the probe numbers). f32-grade accuracy uses the same manual
bf16x3 split (Mosaic lowers f32 dots to one lossy bf16 pass).

Semantics are bit-compatible with _accumulate at the same plan (tested in
interpret mode); the production difference is w_win=64 instead of 32,
which is *more* accurate interpolation. Reference workload:
sar_batch_sim.py:171-238 (512^2 x 2,500 pulses VideoSAR frames).

Traced under jax.enable_x64(False) like every pallas kernel here (the
global x64 flag injects an i64 the Mosaic compiler cannot legalize).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nis_sar_amtigmti_video_tpu.ops.bp_fast import FastBpPlan
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (roll_half as
                                                          _roll_half)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (split_pair as
                                                          _split_pair)

_LANE = 128
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_TWO_PI = 2.0 * math.pi


def supported(plan: FastBpPlan) -> bool:
    return (plan.w_win == 64 and plan.nx_i % _LANE == 0
            and plan.ny_i % _LANE == 0)


def _dft_tables(w: int, taper_pow: int):
    """Tapered forward DFT as the (2W, 2W) real block RHS for [re|im]
    minor-half operands: M[s, m] = tap[s] e^{-2pi i s m / W} / W."""
    s = np.arange(w)
    tap = np.sin(np.pi * (s + 0.5) / w) ** taper_pow
    m = tap[:, None] * np.exp(-2j * np.pi * np.outer(s, s) / w) / w
    top = np.concatenate([m.real, m.imag], axis=1)
    bot = np.concatenate([-m.imag, m.real], axis=1)
    return _split_pair(np.concatenate([top, bot], axis=0))


def _kernel(win, u0, pa, pb, pc, bt, ct, m_hi, m_lo, out_r, out_i,
            *, bp: int, w: int, taper_pow: int, mode: str,
            ablate: str = ""):
    # ``ablate`` is a study knob (scripts/probe_bp_acc_ablate.py) that
    # replaces one stage with identity to attribute kernel time; never set
    # in production paths.
    ty = win.shape[1]
    nx = out_r.shape[1]
    ip = pl.program_id(1)

    # signed fftfreq via 2-D i32 iota (1-D and float iotas are illegal in
    # Mosaic), converted after the integer compare
    mi = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    f_m = jnp.where(mi < w // 2, mi, mi - w).astype(jnp.float32) / w
    xi_full = (jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)
               .astype(jnp.float32) - jnp.float32((nx - 1) / 2.0))

    def dot3(z, wh, wl):
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        zh = z.astype(jnp.bfloat16)
        if mode == "bf16":
            return d(zh, wh)
        zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(zh, wh) + d(zh, wl) + d(zl, wh)

    def one_pulse(t, acc):
        acc_r, acc_i = acc
        s = jnp.swapaxes(win[t], 0, 1)               # (TY, [re|im]) lanes
        if ablate == "min_body":                     # read+transpose floor
            return (acc_r + s[:, :1] * 1e-6, acc_i + s[:, 1:2] * 1e-6)
        wh = dot3(s, m_hi[:], m_lo[:])               # (TY, [m_re|m_im])

        # window-offset ramp e^{+j 2pi f_m u0}
        u0_t = u0[t][:, None]                        # (TY, 1)
        ang = _TWO_PI * u0_t * f_m                   # (TY, W)
        if ablate == "no_ramp":
            ca, sa = ang * 0.0 + 1.0, ang * 0.0
        else:
            ca, sa = jnp.cos(ang), jnp.sin(ang)
        a2 = jnp.concatenate([ca, ca], axis=1)
        b2 = jnp.concatenate([-sa, sa], axis=1)
        g = wh * a2 + _roll_half(wh) * b2            # (TY, [m_re|m_im])

        # column kernel e^{+j 2pi f_m e_t(x)}, e_t = bt xi + ct xi^2
        e_x = bt[t, 0] * xi_full + ct[t, 0] * xi_full * xi_full   # (1, NX)
        angk = _TWO_PI * f_m.reshape(w, 1) * e_x     # (W, NX)
        kr = jnp.cos(angk)
        ki = jnp.sin(angk)
        kb = jnp.concatenate(
            [jnp.concatenate([kr, ki], axis=1),
             jnp.concatenate([-ki, kr], axis=1)], axis=0)         # (2W, 2NX)
        kb_h = kb.astype(jnp.bfloat16)
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        gh = g.astype(jnp.bfloat16)
        if mode == "bf16":
            val2 = d(gh, kb_h)
        else:
            gl = (g - gh.astype(jnp.float32)).astype(jnp.bfloat16)
            kb_l = (kb - kb_h.astype(jnp.float32)).astype(jnp.bfloat16)
            val2 = d(gh, kb_h) + d(gh, kb_l) + d(gl, kb_h)
        v_re = val2[:, :nx]
        v_im = val2[:, nx:]

        # taper division at the true evaluation points
        u = u0_t + e_x                               # (TY, NX)
        if ablate == "no_taper":
            inv = u * 0.0 + 1.0
        else:
            tap = jnp.sin(jnp.pi * (u + 0.5) / w)
            tap = tap * tap
            tap = tap * tap if taper_pow == 4 else tap ** (taper_pow // 2)
            inv = 1.0 / jnp.maximum(tap, 1e-4)

        # focusing phase quadratic
        ph = (pa[t][:, None] + pb[t][:, None] * xi_full
              + pc[t][:, None] * (xi_full * xi_full))
        if ablate == "no_phase":
            cp, sp = ph * 0.0 + 1.0, ph * 0.0
        else:
            cp, sp = jnp.cos(ph), jnp.sin(ph)
        return (acc_r + (v_re * cp - v_im * sp) * inv,
                acc_i + (v_re * sp + v_im * cp) * inv)

    z = jnp.zeros(out_r.shape, jnp.float32)
    acc_r, acc_i = jax.lax.fori_loop(0, bp, one_pulse, (z, z))

    @pl.when(ip == 0)
    def _init():
        out_r[:] = acc_r
        out_i[:] = acc_i

    @pl.when(ip != 0)
    def _acc():
        out_r[:] = out_r[:] + acc_r
        out_i[:] = out_i[:] + acc_i


def accumulate_pallas(rc2, u0, pa, pb, pc, b_t, c_t, plan: FastBpPlan,
                      block: int = 16, tile_y: int = 512,
                      mode: str = "bf16x3", interpret: bool = False,
                      ablate: str = ""):
    """Drop-in for ops/bp_fast.py::_accumulate (same operands, same output)
    running the fused pixel-tile kernel. Requires ``supported(plan)``."""
    if not supported(plan):
        raise ValueError("accumulate_pallas needs w_win=64 and 128-multiple "
                         f"internal grid, got {(plan.w_win, plan.ny_i, plan.nx_i)}")
    num_p = rc2.shape[0]
    w = plan.w_win
    ny, nx = plan.ny_i, plan.nx_i
    while ny % tile_y:
        tile_y //= 2

    # windows in XLA (W static strided slices — cheap, single HBM pass),
    # packed as (P, [re_w; im_w], ny): the window axis sits in the MIDDLE so
    # every temporary keeps ny on the lanes (a stack on a new minor axis
    # creates (P, ny, 1) temporaries that XLA pads 128x — 30 GB at the
    # production shape); the kernel transposes one (2W, TY) block per pulse
    band = jax.lax.slice_in_dim(
        rc2, plan.band_start,
        plan.band_start + plan.stride * (ny - 1) + w, 1, axis=1)
    cols = [jax.lax.slice_in_dim(band, off, off + plan.stride * (ny - 1) + 1,
                                 plan.stride, axis=1) for off in range(w)]
    win_pk = jnp.stack([jnp.real(c) for c in cols]
                       + [jnp.imag(c) for c in cols],
                       axis=1).astype(jnp.float32)       # (P, 2W, ny)

    p_pad = -(-num_p // block) * block

    def padp(x):
        return jnp.pad(x, [(0, p_pad - num_p)] + [(0, 0)] * (x.ndim - 1))

    win_pk = padp(win_pk)
    u0p, pap, pbp, pcp = padp(u0), padp(pa), padp(pb), padp(pc)
    btp = padp(b_t).reshape(-1, 1)
    ctp = padp(c_t).reshape(-1, 1)

    m_hi, m_lo = _dft_tables(w, plan.taper_pow)
    grid = (ny // tile_y, p_pad // block)

    bs_win = pl.BlockSpec((block, 2 * w, tile_y), lambda iy, ip: (ip, 0, iy))
    bs_row = pl.BlockSpec((block, tile_y), lambda iy, ip: (ip, iy))
    bs_sc = pl.BlockSpec((block, 1), lambda iy, ip: (ip, 0))
    bs_tab = pl.BlockSpec((2 * w, 2 * w), lambda iy, ip: (0, 0))
    bs_out = pl.BlockSpec((tile_y, nx), lambda iy, ip: (iy, 0))

    with jax.enable_x64(False):
        our, oui = pl.pallas_call(
            partial(_kernel, bp=block, w=w, taper_pow=plan.taper_pow,
                    mode=mode, ablate=ablate),
            grid=grid,
            in_specs=[bs_win, bs_row, bs_row, bs_row, bs_row,
                      bs_sc, bs_sc, bs_tab, bs_tab],
            out_specs=[bs_out, bs_out],
            out_shape=[jax.ShapeDtypeStruct((ny, nx), jnp.float32)] * 2,
            compiler_params=_VMEM,
            interpret=interpret,
        )(win_pk, u0p, pap, pbp, pcp, btp, ctp, m_hi, m_lo)
    return jax.lax.complex(our, oui)
