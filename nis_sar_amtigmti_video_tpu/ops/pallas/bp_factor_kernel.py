"""Pallas TPU kernel for the *factorized* fast-BP inner sums.

ops/bp_fast.py::_accumulate_factor is the XLA version: per sub-aperture it
materializes (sub_p, ny, nx_c) value / taper / residual-phase fields in HBM
between fusions — ~100 MB of complex64 per scan step at the reference
VideoSAR shape (1536 x 128 coarse grid, 64 presummed pulses per
sub-aperture), and the round-3 ablation (scripts/probe_bp_factor_ablate.py)
attributed most of the accumulate's ~19 ms to exactly that traffic: the
trig itself is ~3.4 ms (d_ph) + ~2.2 ms (taper), while the "no-trig"
einsum/windows/merge skeleton still costs ~13 ms.

This kernel keeps one (TY, nx_c) coarse tile in VMEM and streams the
sub-aperture's pulses over it, fusing the whole per-pulse chain

    packed windows -> tapered W-point DFT -> window-offset ramp
    (with the residual-anchor A term folded into the same rotation)
    -> column Fourier kernel matmul -> taper division
    -> residual phase e^{j(B xi_c + C xi_c^2)} -> accumulate

with no HBM traffic beyond reading each packed window once and one
(n_sub, ny, nx_c) inner-image write. The merge to the fine grid (banded
Kaiser-sinc matmul + anchor carrier) stays in XLA — it touches only the
small inner images.

Lane discipline follows ops/pallas/bp_kernel.py: complex data rides as
[re | im] minor halves, the W = 32 complex window DFT packs to a (64, 64)
real block, and the column kernel to (64, 2*nx_c) with nx_c = 128 — full
MXU tiles on the output side. f32-grade accuracy ('bf16x3' mode) uses the
manual hi/lo split from ops/pallas/blocks.py; 'bf16' is the single-pass
throughput mode (math_mode='fast').

Semantics match _accumulate_factor at the same plan (equality-tested in
interpret mode, tests/test_bp_fast.py). Reference workload:
sar_batch_sim.py:171-238 (512^2 x 2,500-pulse VideoSAR frames).

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
from nis_sar_amtigmti_video_tpu.ops.pallas.bp_kernel import _dft_tables
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (roll_half as
                                                          _roll_half)

_LANE = 128
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_TWO_PI = 2.0 * math.pi


def supported(plan: FastBpPlan) -> bool:
    """The kernel wants the production factor plan: 32-point windows,
    a full-lane coarse grid, and 128-multiple internal dims."""
    return (plan.w_win == 32 and plan.nx_c == _LANE
            and plan.sub_raw > 0 and plan.ny_i % _LANE == 0
            and plan.nx_i % _LANE == 0)


def _kernel(win, u0, ad, bd, cd, bt, ct, wl, m_hi, m_lo, out_r, out_i,
            *, sub_p: int, w: int, taper_pow: int, h: float, mode: str,
            feed: str):
    ty = out_r.shape[1]
    nxc = out_r.shape[2]

    # signed fftfreq via 2-D i32 iota (1-D and float iotas are illegal in
    # Mosaic), converted after the integer compare
    mi = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    f_m = jnp.where(mi < w // 2, mi, mi - w).astype(jnp.float32) / w
    # coarse column abscissae in FINE-pixel units (matches bp_fast's xic)
    xic = (jax.lax.broadcasted_iota(jnp.int32, (1, nxc), 1)
           .astype(jnp.float32)
           - jnp.float32((nxc - 1) / 2.0)) * jnp.float32(h)

    def dot3(z, wh, wl_):
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        zh = z.astype(jnp.bfloat16)
        if mode == "bf16":
            return d(zh, wh)
        zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(zh, wh) + d(zh, wl_) + d(zl, wh)

    def one_pulse(t, acc):
        acc_r, acc_i = acc
        s = jnp.swapaxes(win[t], 0, 1)               # (TY, [re_w | im_w])
        # feed='windows': tapered W-point DFT in-kernel (one more dot);
        # feed='spectra': the XLA strided-conv spectra arrive pre-DFT'd
        wh = s if feed == "spectra" else dot3(s, m_hi[:], m_lo[:])

        # window-offset ramp e^{+j 2pi f_m u0} with the residual anchor
        # term e^{+j A} folded into the same rotation (A is m-independent,
        # so it rides the per-(y, m) angle for free) and the live-pulse
        # weight folded into the cos/sin pair
        u0_t = u0[t][:, None]                        # (TY, 1)
        ang = _TWO_PI * u0_t * f_m + ad[t][:, None]  # (TY, W)
        ca = jnp.cos(ang) * wl[t, 0]
        sa = jnp.sin(ang) * wl[t, 0]
        a2 = jnp.concatenate([ca, ca], axis=1)
        b2 = jnp.concatenate([-sa, sa], axis=1)
        g = wh * a2 + _roll_half(wh) * b2            # (TY, [m_re | m_im])

        # coarse column kernel e^{+j 2pi f_m e_t(xi_c)}
        e_x = bt[t, 0] * xic + ct[t, 0] * xic * xic  # (1, NXC)
        angk = _TWO_PI * f_m.reshape(w, 1) * e_x     # (W, NXC)
        kr = jnp.cos(angk)
        ki = jnp.sin(angk)
        kb = jnp.concatenate(
            [jnp.concatenate([kr, ki], axis=1),
             jnp.concatenate([-ki, kr], axis=1)], axis=0)       # (2W, 2NXC)
        kb_h = kb.astype(jnp.bfloat16)
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        gh = g.astype(jnp.bfloat16)
        if mode == "bf16":
            val2 = d(gh, kb_h)
        else:
            gl = (g - gh.astype(jnp.float32)).astype(jnp.bfloat16)
            kb_l = (kb - kb_h.astype(jnp.float32)).astype(jnp.bfloat16)
            val2 = d(gh, kb_h) + d(gh, kb_l) + d(gl, kb_h)
        v_re = val2[:, :nxc]
        v_im = val2[:, nxc:]

        # taper division at the true evaluation points
        u = u0_t + e_x                               # (TY, NXC)
        tap = jnp.sin(jnp.pi * (u + 0.5) / w)
        tap = tap * tap
        tap = tap * tap if taper_pow == 4 else tap ** (taper_pow // 2)
        inv = 1.0 / jnp.maximum(tap, 1e-4)

        # residual phase (the A term already rode the g rotation)
        dph = bd[t][:, None] * xic + cd[t][:, None] * (xic * xic)
        cp = jnp.cos(dph)
        sp = jnp.sin(dph)
        return (acc_r + (v_re * cp - v_im * sp) * inv,
                acc_i + (v_re * sp + v_im * cp) * inv)

    z = jnp.zeros((ty, nxc), jnp.float32)
    acc_r, acc_i = jax.lax.fori_loop(0, sub_p, one_pulse, (z, z))
    out_r[:] = acc_r[None]
    out_i[:] = acc_i[None]


def accumulate_factor_pallas(rc2, u0, pa, pb, pc, b_t, c_t,
                             plan: FastBpPlan, sub_p: int,
                             tile_y: int = 512, mode: str = "bf16x3",
                             interpret: bool = False,
                             feed: str = "windows"):
    """Drop-in for ops/bp_fast.py::_accumulate_factor (same operands, same
    output) running the fused coarse-tile kernel for the inner sums and the
    XLA merge (Kaiser-sinc upsample + anchor carrier) on the small
    (n_sub, ny, nx_c) inner images. Requires ``supported(plan)``."""
    from nis_sar_amtigmti_video_tpu.ops.bp_fast import _upsample_matrix
    from nis_sar_amtigmti_video_tpu.utils.cplx import expj

    if not supported(plan):
        raise ValueError(
            "accumulate_factor_pallas needs w_win=32, nx_c=128 and a "
            "128-multiple internal grid, got "
            f"{(plan.w_win, plan.nx_c, plan.ny_i, plan.nx_i)}")
    num_p = rc2.shape[0]
    w = plan.w_win
    ny, nx, nxc = plan.ny_i, plan.nx_i, plan.nx_c
    h = nx / nxc
    while ny % tile_y:
        tile_y //= 2

    n_sub = -(-num_p // sub_p)
    p_pad = n_sub * sub_p

    # packed windows (P, [re_w; im_w], ny): window axis in the MIDDLE so
    # every temporary keeps ny on the lanes (see bp_kernel.py's note on the
    # 128x pad tax of a new minor axis). feed='spectra' ships the tapered
    # window DFT from the XLA strided MXU conv instead (same layout, same
    # HBM footprint; drops the in-kernel (TY, 2W)@(2W, 2W) dot)
    band = jax.lax.slice_in_dim(
        rc2, plan.band_start,
        plan.band_start + plan.stride * (ny - 1) + w, 1, axis=1)
    if feed == "spectra":
        from nis_sar_amtigmti_video_tpu.ops.bp_fast import _window_spectra
        sp = _window_spectra(band, plan)                  # (P, W, ny) cplx
        win_pk = jnp.concatenate([jnp.real(sp), jnp.imag(sp)],
                                 axis=1).astype(jnp.float32)
    else:
        cols = [jax.lax.slice_in_dim(band, off,
                                     off + plan.stride * (ny - 1) + 1,
                                     plan.stride, axis=1)
                for off in range(w)]
        win_pk = jnp.stack([jnp.real(c) for c in cols]
                           + [jnp.imag(c) for c in cols],
                           axis=1).astype(jnp.float32)    # (P, 2W, ny)

    def padp(x, edge=False):
        cfg = [(0, p_pad - num_p)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, mode="edge" if edge else "constant")

    win_pk = padp(win_pk)
    # anchor (centre-pulse) rows per sub-aperture; clipped so a ragged
    # final sub-aperture anchors on a live pulse (same as the XLA path)
    ci = jnp.minimum(jnp.arange(n_sub) * sub_p + sub_p // 2, num_p - 1)
    pa_c, pb_c, pc_c = pa[ci], pb[ci], pc[ci]
    rep = jnp.repeat(jnp.arange(n_sub), sub_p)
    ad = padp(pa, edge=True) - pa_c[rep]
    ad = ad - _TWO_PI * jnp.round(ad / _TWO_PI)           # f32-trig-safe
    bd = padp(pb, edge=True) - pb_c[rep]
    cd = padp(pc, edge=True) - pc_c[rep]
    u0p = padp(u0, edge=True)
    btp = padp(b_t, edge=True).reshape(-1, 1)
    ctp = padp(c_t, edge=True).reshape(-1, 1)
    wl = jnp.pad(jnp.ones((num_p,), jnp.float32),
                 (0, p_pad - num_p)).reshape(-1, 1)

    m_hi, m_lo = _dft_tables(w, plan.taper_pow)
    grid = (n_sub, ny // tile_y)

    bs_win = pl.BlockSpec((sub_p, 2 * w, tile_y), lambda s, iy: (s, 0, iy))
    bs_row = pl.BlockSpec((sub_p, tile_y), lambda s, iy: (s, iy))
    bs_sc = pl.BlockSpec((sub_p, 1), lambda s, iy: (s, 0))
    bs_tab = pl.BlockSpec((2 * w, 2 * w), lambda s, iy: (0, 0))
    bs_out = pl.BlockSpec((1, tile_y, nxc), lambda s, iy: (s, iy, 0))

    with jax.enable_x64(False):
        jr, ji = pl.pallas_call(
            partial(_kernel, sub_p=sub_p, w=w, taper_pow=plan.taper_pow,
                    h=h, mode=mode, feed=feed),
            grid=grid,
            in_specs=[bs_win, bs_row, bs_row, bs_row, bs_row,
                      bs_sc, bs_sc, bs_sc, bs_tab, bs_tab],
            out_specs=[bs_out, bs_out],
            out_shape=[jax.ShapeDtypeStruct((n_sub, ny, nxc),
                                            jnp.float32)] * 2,
            compiler_params=_VMEM,
            interpret=interpret,
        )(win_pk, u0p, ad, bd, cd, btp, ctp, wl, m_hi, m_lo)
    j_s = jax.lax.complex(jr, ji)

    # merge in XLA: banded Kaiser-sinc upsample + anchor carrier — touches
    # only the small inner images (n_sub, ny, nx_c)
    u_mat = jnp.asarray(_upsample_matrix(plan))
    xi = (jnp.arange(nx, dtype=jnp.float32) - (nx - 1) / 2.0)

    m_prec = (jax.lax.Precision.DEFAULT if mode == "bf16"
              else jax.lax.Precision.HIGHEST)   # tiny matmul: exact is free

    def merge(img, x):
        js_s, pac, pbc, pcc = x
        carrier = expj(pac[:, None] + pbc[:, None] * xi[None, :]
                       + pcc[:, None] * xi[None, :] ** 2)
        return img + carrier * jnp.matmul(js_s, u_mat, precision=m_prec), None

    img0 = jnp.zeros((ny, nx), jnp.complex64)
    img, _ = jax.lax.scan(merge, img0, (j_s, pa_c, pb_c, pc_c))
    return img
