"""Pallas TPU megakernel: fused CSA (FFTs + phase multiplies in VMEM).

The XLA CSA path (ops/csa.py::apply_csa_fused) is HBM-bound: each of the
four FFT passes and three phase multiplies is a separate round trip over the
(n_az x n_rg) complex image (~9 passes). This module runs the whole chain in
THREE pallas kernels — one HBM round trip each:

  K1  column blocks (n_az, 128): azimuth four-step FFT + Phi1 multiply
  K2  row blocks (rows, n_rg):   range FFT -> Phi2 -> range IFFT -> Phi3,
                                 all VMEM-resident
  K3  column blocks (n_az, 128): azimuth inverse four-step FFT

FFTs are four-step factorizations N = B*B (B = sqrt(N)): two (B x B) DFT
contractions on the MXU with a twiddle multiply between.

MXU shape discipline (measured on v5e, scripts/probe_mxu_shapes.py /
probe_dot_accuracy.py):

  * dots with K = N = 128 run at >=190 TF/s in either operand order;
    64-wide dot_generals run at ~5 TF/s — 40x slower. Every contraction
    here is therefore a FULL-WIDTH (2B, 2B) = (128, 128) complex
    block-matrix dot with re/im planes stacked onto the contracted axis
    ([re_d; im_d] sublane-side) or carried in minor halves ([re|im] lanes),
    never a (B, B) = (64, 64) real dot.
  * Mosaic lowers f32 jnp.dot to ONE bf16 MXU pass regardless of the
    requested precision (measured rel-err 2.6e-3 == pure-bf16 rounding).
    For f32-grade accuracy the dots run as a manual bf16x3 split:
    hi@Whi + hi@Wlo + lo@Whi with f32 accumulation (measured 5e-6), at
    ~3x the (near-free) MXU cost. ``mode='bf16'`` selects the single-pass
    variant when bf16-class output is acceptable.

K2 layout walk (range digits p, q with sample index s = p*B + q, frequency
f = m*B + k; R = block rows):

  (R,p,q) --stack--> (R,[p_re;p_im],q) --dot W--> (R,q,[k_re|k_im])
  --twiddle (lane-roll trick)--> --restack--> (R,k,[q_re|q_im])
  --minor dot W--> (R,k,[m_re|m_im]) --Phi2--> --minor dot Wi-->
  (R,k,[q_re|q_im]) --conj twiddle--> --restack--> (R,q,[k_re|k_im])
  --minor dot Wi--> (R,q,[p_re|p_im]) --Phi3--> --swapaxes--> planes (R,p,q)

Complex multiplies against minor-half state use the roll-by-B identity
  out = s*A + roll_half(s)*B',  roll_half = swap of the two lane halves,
with host-precomputed A/B tables for the twiddles and in-kernel cos/sin for
the azimuth-dependent Phi2/Phi3. Phases come from the 1-D CsaFactors
vectors (same decomposition as apply_csa_fused, ops/csa.py:129-145), so
HBM sees no phase grids at all.

Every pallas_call is traced under jax.enable_x64(False): the global x64
flag injects an i64 into the grid state that Mosaic cannot legalize (round-1
root cause; see ops/pallas/echo_kernel.py).

Shapes: requires n_az and n_rg to be perfect squares with sqrt a multiple
of 8 (4096 = 64^2 is the production shape); callers fall back to the XLA
path otherwise (ops/csa.py::apply_csa_fused dispatch).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _isqrt_ok(n: int) -> int:
    a = int(math.isqrt(n))
    return a if a * a == n and a % 8 == 0 else 0


def supported(n_az: int, n_rg: int) -> bool:
    return bool(_isqrt_ok(n_az)) and bool(_isqrt_ok(n_rg)) \
        and n_rg % _LANE == 0 and n_az % _LANE == 0


# --------------------------------------------------------------------------
# precision-managed complex block dots
# --------------------------------------------------------------------------

from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (roll_half as
                                                           _roll_half)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (split_pair as
                                                          _split_pair)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (wblk_rhs as
                                                          _wblk_rhs)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import blk_lhs as _blk_lhs


def _dot3(z, w_hi, w_lo, axis: int, mode: str):
    """Contraction of f32 ``z`` axis ``axis`` with a (K, N) block matrix at
    f32-grade accuracy via bf16x3 (Mosaic's f32 dot is a single lossy bf16
    pass — module docstring).

    mode='wf16' keeps the DATA at hi+lo grade but truncates the table to
    its bf16 hi half (2 dots instead of 3). MEASURED AND RULED OUT for
    production (round 4, scripts/probe_k2_mode_r4.py + ROUND4_NOTES §2):
    the common-operator cancellation argument holds only qualitatively —
    on a focused scene wf16 busts the fidelity budget (0.30 dB on
    hardware) while saving just 1.7% of the CPI (K2 is VPU/layout-bound,
    not dot-bound). It remains a quarantined measurement knob for probe
    A/Bs only (docs/PERF_GUIDE.md "Variant retirement policy")."""
    dn = (((axis,), (0,)), ((), ()))
    d = partial(jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    zh = z.astype(jnp.bfloat16)
    if mode == "bf16":
        return d(zh, w_hi)
    zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
    if mode == "wf16":
        return d(zh, w_hi) + d(zl, w_hi)
    return d(zh, w_hi) + d(zh, w_lo) + d(zl, w_hi)


def _restack(x):
    """(R, e, [re_d | im_d]) -> (R, d, [re_e | im_e]): swap the free digit
    into the minor halves so the next contraction (over e) is a minor-axis
    block dot. Composed as swapaxes + sublane slices + lane concat — the
    direct lane-slice/sublane-concat form crashes the Mosaic compiler at
    production shapes."""
    b = x.shape[-1] // 2
    t = jnp.swapaxes(x, 1, 2)                       # (R, [h, d], e)
    return jnp.concatenate([t[:, :b, :], t[:, b:, :]], axis=2)


def _half_sign(shape3, b: int):
    """(1, 1, 2B) lane vector: -1 on the re half, +1 on the im half."""
    i = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    return jnp.where(i >= b, jnp.float32(1.0), jnp.float32(-1.0))


# --------------------------------------------------------------------------
# K1/K3: azimuth four-step FFT over the leading axis (column blocks)
# --------------------------------------------------------------------------

def _dft_consts(a: int, n: int):
    """A-point DFT matrix e^{-2pi i jk/A} and the N-point four-step twiddle
    e^{-2pi i cb/N}, in f64."""
    j = np.arange(a)
    f = np.exp(-2j * np.pi * np.outer(j, j) / a)
    t = np.exp(-2j * np.pi * np.outer(j, j) / n)
    return f, t


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdot_blk(w_hi, w_lo, zr, zi, mode: str):
    """Leading-axis complex matmul via the LHS block matrix: planes stacked
    on axis 0, one (2A, 2A) @ (2A, M) dot (bf16x3-managed)."""
    h = zr.shape[0]
    x2 = jnp.concatenate([zr, zi], axis=0)
    xh = x2.astype(jnp.bfloat16)
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    if mode == "bf16":
        y2 = d(w_hi, xh)
    else:
        xl = (x2 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        y2 = d(w_hi, xh) + d(w_lo, xh) + d(w_hi, xl)
    return y2[:h], y2[h:]


def _fft_lead(zr, zi, wh, wl, tr_m, ti_m, tsgn, a: int, lane: int, mode: str,
              variant: str = "swap"):
    """Leading-axis four-step transform; twiddle sign ``tsgn`` (+1 fwd,
    -1 inv). variant='swap' moves the second digit onto the leading axis
    with a sublane transpose (round-2 form); 'dots' contracts the middle
    (j2) axis directly — the complex pair stacks along the contracted axis
    so the SAME block tables apply, lanes stay minor, and the transpose
    disappears (the K2 swap_dot idea applied to K1/K3)."""
    n = a * a
    zr = zr.reshape(a, a * lane)
    zi = zi.reshape(a, a * lane)
    yr, yi = _cdot_blk(wh, wl, zr, zi, mode)
    yr = yr.reshape(a, a, lane)
    yi = yi.reshape(a, a, lane)
    yr, yi = _cmul(yr, yi, tr_m[:, :, None], tsgn * ti_m[:, :, None])
    if variant == "dots":
        z3 = jnp.concatenate([yr, yi], axis=1)             # (k1, 2j2, lane)
        dd = partial(jax.lax.dot_general,
                     dimension_numbers=(((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.float32)
        zh = z3.astype(jnp.bfloat16)
        if mode == "bf16":
            y2 = dd(wh, zh)
        else:
            zl = (z3 - zh.astype(jnp.float32)).astype(jnp.bfloat16)
            y2 = dd(wh, zh) + dd(wl, zh) + dd(wh, zl)      # (2k2, k1, lane)
        return y2[:a].reshape(n, lane), y2[a:].reshape(n, lane)
    yr = jnp.swapaxes(yr, 0, 1).reshape(a, a * lane)
    yi = jnp.swapaxes(yi, 0, 1).reshape(a, a * lane)
    sr, si = _cdot_blk(wh, wl, yr, yi, mode)
    return sr.reshape(n, lane), si.reshape(n, lane)


def _k1_body(xr, xi, u, c1, w, wh, wl, tr_m, ti_m, our, oui,
             *, a: int, mode: str, variant: str):
    lane = xr.shape[-1]
    sr, si = _fft_lead(xr[:], xi[:], wh[:], wl[:], tr_m[:], ti_m[:],
                       jnp.float32(1.0), a, lane, mode, variant=variant)
    # Phi1 = exp(j * c1 * (u - w)^2) with c1, w per az frequency (natural
    # order), u per range sample
    du = u[:] - w[:]
    ph = c1[:] * du * du
    pr, pi = jnp.cos(ph), jnp.sin(ph)
    our[:], oui[:] = _cmul(sr, si, pr, pi)


def _k1_call(xr, xi, u, c1, w, a: int, interpret: bool, mode: str,
             variant: str = "swap"):
    n = a * a
    n_rg = xr.shape[-1]
    f_m, t_m = _dft_consts(a, n)
    wh, wl = _split_pair(_blk_lhs(f_m))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    grid = (n_rg // _LANE,)
    bs_dat = pl.BlockSpec((n, _LANE), lambda j: (0, j))
    bs_u = pl.BlockSpec((1, _LANE), lambda j: (0, j))
    bs_az = pl.BlockSpec((n, 1), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_k1_body, a=a, mode=mode, variant=variant),
            grid=grid,
            in_specs=[bs_dat, bs_dat, bs_u, bs_az, bs_az,
                      bs_blk, bs_blk, bs_c, bs_c],
            out_specs=[bs_dat, bs_dat],
            out_shape=[jax.ShapeDtypeStruct((n, n_rg), jnp.float32)] * 2,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=_VMEM,
            interpret=interpret,
        )(xr, xi, u, c1, w, wh, wl, tr_m, ti_m)


def _k3_body(xr, xi, wh, wl, tr_m, ti_m, our, oui, *, a: int, mode: str,
             variant: str):
    lane = xr.shape[-1]
    our[:], oui[:] = _fft_lead(xr[:], xi[:], wh[:], wl[:], tr_m[:], ti_m[:],
                               jnp.float32(-1.0), a, lane, mode,
                               variant=variant)


def _k3_call(xr, xi, a: int, interpret: bool, mode: str,
             variant: str = "swap"):
    n = a * a
    n_rg = xr.shape[-1]
    f_m, t_m = _dft_consts(a, n)
    inv = np.conj(f_m).T / a
    wh, wl = _split_pair(_blk_lhs(inv))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    grid = (n_rg // _LANE,)
    bs_dat = pl.BlockSpec((n, _LANE), lambda j: (0, j))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_k3_body, a=a, mode=mode, variant=variant),
            grid=grid,
            in_specs=[bs_dat, bs_dat, bs_blk, bs_blk, bs_c, bs_c],
            out_specs=[bs_dat, bs_dat],
            out_shape=[jax.ShapeDtypeStruct((n, n_rg), jnp.float32)] * 2,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=_VMEM,
            interpret=interpret,
        )(xr, xi, wh, wl, tr_m, ti_m)


# --------------------------------------------------------------------------
# K2: range FFT -> Phi2 -> range IFFT -> Phi3 (one round trip, full-width)
# --------------------------------------------------------------------------

def _k2_body(xr, xi, frs2, alpha, beta, cph3, dr3, usq3, rphase, g, c3,
             wf_hi, wf_lo, wi_hi, wi_lo, fc_hi, fc_lo, ic_hi, ic_lo,
             a1, b1, a2, b2, our, oui, *, b: int, mode: str, variant: str):
    sgn = _half_sign((1, 1, 2 * b), b)

    def swap_dot(s, ch, cl):
        """(R, e, [d_re|d_im]) --contract e with [Wr | Wi]--> (R, d,
        [out_re|out_im]): the restack-free digit swap. One sublane-axis
        dot against the lane-concatenated real/imag DFT parts gives all
        four real products as sublane x lane quadrants
        ([[re*Wr, re*Wi], [im*Wr, im*Wi]]); the recombination
        [re*Wr - im*Wi | im*Wr + re*Wi] is ONE sublane-half split + one
        lane-half roll + a signed add — the round-5 form of the original
        four lane-half quadrant slices + lane concat (algebraically
        element-identical — the sgn multiply IS the subtraction — and
        within the kernel's f32 rounding class; the compiler may fuse
        the mul/add differently), which cost ~4 extra VREG shuffle
        passes per call on a kernel the round-5 bill probe showed is
        layout-bound, not dot-bound (scripts/probe_k2_bill_r5.py)."""
        dc = _dot3(s, ch, cl, 1, mode)                     # (R, 2d, 2m)
        return dc[:, :b, :] + _roll_half(dc[:, b:, :]) * sgn

    # ---- forward range FFT: contract p, twiddle, contract q
    z = jnp.concatenate([xr[:], xi[:]], axis=1)            # (R, 2p, q)
    s = _dot3(z, wf_hi[:], wf_lo[:], 1, mode)              # (R, q, [k|k])
    s = s * a1[:][None] + _roll_half(s) * b1[:][None]      # e^{-j 2pi kq/N}
    if variant == "dots":
        s = swap_dot(s, fc_hi[:], fc_lo[:])                # (R, k, [m|m])
    else:
        s = _restack(s)                                    # (R, k, [q|q])
        s = _dot3(s, wf_hi[:], wf_lo[:], 2, mode)          # (R, k, [m|m])

    # ---- Phi2 = exp(j*(alpha*fr + beta)*fr), fr in the (k, [m|m]) layout
    fv = frs2[:][None]
    ph = (alpha[:] * fv + beta[:]) * fv                    # (R, b, 2b)
    s = s * jnp.cos(ph) + _roll_half(s) * (jnp.sin(ph) * sgn)

    # ---- inverse range FFT: contract m (minor), conj twiddle, contract k
    s = _dot3(s, wi_hi[:], wi_lo[:], 2, mode)              # (R, k, [q|q])
    s = s * a2[:][None] + _roll_half(s) * b2[:][None]      # e^{+j 2pi kq/N}
    if variant == "dots":
        s = swap_dot(s, ic_hi[:], ic_lo[:])                # (R, q, [p|p])
    else:
        s = _restack(s)                                    # (R, q, [k|k])
        s = _dot3(s, wi_hi[:], wi_lo[:], 2, mode)          # (R, q, [p|p])

    # ---- Phi3 = rphase(az) + cphase(s) + g(az)*dr(s) - c3(az)*u(s)^2
    ph3 = rphase[:] + cph3[:][None] + g[:] * dr3[:][None] \
        - c3[:] * usq3[:][None]
    s = s * jnp.cos(ph3) + _roll_half(s) * (jnp.sin(ph3) * sgn)

    # ---- (R, q, [p|p]) -> natural planes (R, p, q)
    our[:] = jnp.swapaxes(s[..., :b], 1, 2)
    oui[:] = jnp.swapaxes(s[..., b:], 1, 2)


def _k2g_body(x1r, x1i, x2r, x2i, frs2, alpha, beta, cph3, dr3, usq3,
              rphase, g, c3, wf_hi, wf_lo, wi_hi, wi_lo,
              fc_hi, fc_lo, ic_hi, ic_lo, a1, b1, a2, b2,
              o1r, o1i, o2r, o2i, *, b: int, mode: str, variant: str):
    """Two-channel K2 in one grid step: the Phi2/Phi3 trig fields depend
    only on (azimuth row, range layout), never on the data, so both
    channels share ONE cos/sin evaluation — half of K2's transcendental
    bill — plus one fetch of the DFT/twiddle tables. The per-channel dot
    pipeline is :func:`_k2_body`'s, bit-identical (cos(ph)·s +
    roll(s)·(sin(ph)·sgn) with the sgn folded into the shared sin)."""
    sgn = _half_sign((1, 1, 2 * b), b)

    def swap_dot(s, ch, cl):
        # sublane-split + lane-roll recombination (see _k2_body's
        # swap_dot docstring; bit-identical to the quadrant-concat form)
        dc = _dot3(s, ch, cl, 1, mode)                     # (R, 2d, 2m)
        return dc[:, :b, :] + _roll_half(dc[:, b:, :]) * sgn

    fv = frs2[:][None]
    ph2 = (alpha[:] * fv + beta[:]) * fv                   # (R, b, 2b)
    cs2 = jnp.cos(ph2)
    sn2 = jnp.sin(ph2) * sgn
    ph3 = rphase[:] + cph3[:][None] + g[:] * dr3[:][None] \
        - c3[:] * usq3[:][None]
    cs3 = jnp.cos(ph3)
    sn3 = jnp.sin(ph3) * sgn

    for xr, xi, our, oui in ((x1r, x1i, o1r, o1i), (x2r, x2i, o2r, o2i)):
        z = jnp.concatenate([xr[:], xi[:]], axis=1)        # (R, 2p, q)
        s = _dot3(z, wf_hi[:], wf_lo[:], 1, mode)          # (R, q, [k|k])
        s = s * a1[:][None] + _roll_half(s) * b1[:][None]
        if variant == "dots":
            s = swap_dot(s, fc_hi[:], fc_lo[:])            # (R, k, [m|m])
        else:
            s = _restack(s)
            s = _dot3(s, wf_hi[:], wf_lo[:], 2, mode)
        s = s * cs2 + _roll_half(s) * sn2
        s = _dot3(s, wi_hi[:], wi_lo[:], 2, mode)          # (R, k, [q|q])
        s = s * a2[:][None] + _roll_half(s) * b2[:][None]
        if variant == "dots":
            s = swap_dot(s, ic_hi[:], ic_lo[:])            # (R, q, [p|p])
        else:
            s = _restack(s)
            s = _dot3(s, wi_hi[:], wi_lo[:], 2, mode)
        s = s * cs3 + _roll_half(s) * sn3
        our[:] = jnp.swapaxes(s[..., :b], 1, 2)
        oui[:] = jnp.swapaxes(s[..., b:], 1, 2)


def k2_pair_call(x1r, x1i, x2r, x2i, f, b: int, interpret: bool, mode: str,
                 rows: int = 64, variant: str = "dots"):
    """Both channels' K2 through :func:`_k2g_body` — one pallas pass.

    Same contract as two :func:`_k2_call` invocations (bit-identical per
    channel); used by the kernel-fused GMTI CPI (gmti/fused.py). rows
    defaults to 64, not _k2_call's 128: the shared trig fields plus TWO
    channels' working sets overflow the 64 MB scoped-VMEM stack at 128
    (93.8 MB measured at 4096^2 on v5e)."""
    n = b * b
    n_az = x1r.shape[0]
    while n_az % rows:
        rows //= 2
    frs2, cph3, dr3, usq3 = _k2_tables(f, b)
    (wf_hi, wf_lo), (wi_hi, wi_lo), (fc_hi, fc_lo), (ic_hi, ic_lo), \
        a1, b1, a2, b2 = _k2_consts(b)
    grid = (n_az // rows,)
    bs_dat = pl.BlockSpec((rows, b, b), lambda i: (i, 0, 0))
    bs_az = pl.BlockSpec((rows, 1, 1), lambda i: (i, 0, 0))
    bs_tab = pl.BlockSpec((b, 2 * b), lambda i: (0, 0))
    bs_w = pl.BlockSpec((2 * b, 2 * b), lambda i: (0, 0))

    def col(v):
        return jnp.asarray(v).reshape(-1, 1, 1)

    with jax.enable_x64(False):
        o = pl.pallas_call(
            partial(_k2g_body, b=b, mode=mode, variant=variant),
            grid=grid,
            in_specs=[bs_dat] * 4 + [bs_tab, bs_az, bs_az, bs_tab, bs_tab,
                                     bs_tab, bs_az, bs_az, bs_az,
                                     bs_w, bs_w, bs_w, bs_w,
                                     bs_tab, bs_tab, bs_tab, bs_tab,
                                     bs_tab, bs_tab, bs_tab, bs_tab],
            out_specs=[bs_dat] * 4,
            out_shape=[jax.ShapeDtypeStruct((n_az, b, b), jnp.float32)] * 4,
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=_VMEM,
            interpret=interpret,
        )(x1r.reshape(n_az, b, b), x1i.reshape(n_az, b, b),
          x2r.reshape(n_az, b, b), x2i.reshape(n_az, b, b), frs2,
          col(f.alpha), col(f.beta), cph3, dr3, usq3,
          col(f.rphase), col(f.g), col(f.c3),
          wf_hi, wf_lo, wi_hi, wi_lo, fc_hi, fc_lo, ic_hi, ic_lo,
          a1, b1, a2, b2)
    return tuple(z.reshape(n_az, n) for z in o)


def _k2_tables(f, b: int):
    """CsaFactors range vectors re-laid for K2's internal digit layouts
    (traced jnp ops — factors may be jit values)."""
    def minor_halves(v, transpose):
        m = jnp.asarray(v).reshape(b, b)
        if transpose:
            m = m.T
        return jnp.tile(m, (1, 2))

    # frequency f = m*B + k at layout (k, [h, m]) -> FRS2[k, hb+m] = fr[m*B+k]
    frs2 = minor_halves(f.fr, True)
    # sample s = p*B + q at layout (q, [h, p]) -> T3[q, hb+p] = v[p*B+q]
    cph3 = minor_halves(f.cphase, True)
    dr3 = minor_halves(f.dr, True)
    usq3 = minor_halves(jnp.asarray(f.u) * jnp.asarray(f.u), True)
    return frs2, cph3, dr3, usq3


def _k2_consts(b: int):
    n = b * b
    j = np.arange(b)
    fwd = np.exp(-2j * np.pi * np.outer(j, j) / b)
    inv = np.exp(2j * np.pi * np.outer(j, j) / b) / b
    wf = _split_pair(_wblk_rhs(fwd))
    wi = _split_pair(_wblk_rhs(inv))
    # lane-concatenated [Wr | Wi] parts for the restack-free digit swap
    fc = _split_pair(np.concatenate([fwd.real, fwd.imag], axis=1))
    ic = _split_pair(np.concatenate([inv.real, inv.imag], axis=1))
    th = 2.0 * np.pi * np.outer(j, j) / n                  # theta[k, q]
    cs, sn = np.cos(th), np.sin(th)
    f32 = lambda x: x.astype(np.float32)
    a1 = f32(np.tile(cs.T, (1, 2)))                        # [q, (h,k)]
    b1 = f32(np.concatenate([sn.T, -sn.T], axis=1))
    a2 = f32(np.tile(cs, (1, 2)))                          # [k, (h,q)]
    b2 = f32(np.concatenate([-sn, sn], axis=1))
    return wf, wi, fc, ic, a1, b1, a2, b2


def _k2_call(xr, xi, f, b: int, interpret: bool, mode: str, rows: int = 128,
             variant: str = "restack"):
    n = b * b
    n_az = xr.shape[0]
    while n_az % rows:
        rows //= 2
    frs2, cph3, dr3, usq3 = _k2_tables(f, b)
    (wf_hi, wf_lo), (wi_hi, wi_lo), (fc_hi, fc_lo), (ic_hi, ic_lo), \
        a1, b1, a2, b2 = _k2_consts(b)
    grid = (n_az // rows,)
    # minor-dim splits are illegal inside Mosaic kernels: reshape to
    # (n_az, b, b) OUTSIDE (a free contiguous view) and use 3-D blocks
    bs_dat = pl.BlockSpec((rows, b, b), lambda i: (i, 0, 0))
    bs_az = pl.BlockSpec((rows, 1, 1), lambda i: (i, 0, 0))
    bs_tab = pl.BlockSpec((b, 2 * b), lambda i: (0, 0))
    bs_w = pl.BlockSpec((2 * b, 2 * b), lambda i: (0, 0))

    def col(v):                                            # (n_az,) -> (.,1,1)
        return jnp.asarray(v).reshape(-1, 1, 1)

    with jax.enable_x64(False):
        our, oui = pl.pallas_call(
            partial(_k2_body, b=b, mode=mode, variant=variant),
            grid=grid,
            in_specs=[bs_dat, bs_dat, bs_tab, bs_az, bs_az, bs_tab, bs_tab,
                      bs_tab, bs_az, bs_az, bs_az, bs_w, bs_w, bs_w, bs_w,
                      bs_tab, bs_tab, bs_tab, bs_tab,
                      bs_tab, bs_tab, bs_tab, bs_tab],
            out_specs=[bs_dat, bs_dat],
            out_shape=[jax.ShapeDtypeStruct((n_az, b, b), jnp.float32)] * 2,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=_VMEM,
            interpret=interpret,
        )(xr.reshape(n_az, b, b), xi.reshape(n_az, b, b), frs2,
          col(f.alpha), col(f.beta), cph3, dr3, usq3,
          col(f.rphase), col(f.g), col(f.c3),
          wf_hi, wf_lo, wi_hi, wi_lo, fc_hi, fc_lo, ic_hi, ic_lo,
          a1, b1, a2, b2)
    return our.reshape(n_az, n), oui.reshape(n_az, n)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def apply_csa_pallas_planes(xr, xi, f, interpret: bool = False,
                            mode: str = "bf16x3",
                            k2_variant: str = "dots",
                            lead_variant: str = "swap",
                            k2_rows: int = 32):
    """Planes-native fused CSA: re/im f32 (..., n_az, n_rg) -> re/im SLC.

    This is the production entry: complex64<->plane conversions around the
    kernels provoke XLA's X64SplitHigh custom call, whose layout assignment
    can pick a transposed {0,2,1} parameter layout with 64x tile padding
    (8+ GB of HBM at 4096^2 batch 2 — the round-1 layout trap). Callers that
    already hold planes (the bench, the device-boundary convention of
    utils/cplx) should stay in planes end to end.

    mode='bf16x3' (default) runs every MXU contraction as a hi/lo bf16
    split (f32-grade, ~5e-6); mode='bf16' single-pass (~2.6e-3, what a raw
    Mosaic f32 dot would silently give anyway).

    Round-5 defaults: k2_variant='dots' + k2_rows=32 — with the cheap
    swap_dot recombination the dots digit swap now wins standalone too
    (6.94 vs the former restack/128's 8.03 ms/plane at 4096^2,
    scripts/probe_form_rows_r5.py); 'restack' remains the equality twin.
    """
    n_az, n_rg = xr.shape[-2], xr.shape[-1]
    if not supported(n_az, n_rg):
        raise ValueError(f"apply_csa_pallas needs square-factorable shapes, "
                         f"got {(n_az, n_rg)}")
    a = int(math.isqrt(n_az))
    b = int(math.isqrt(n_rg))
    lead = xr.shape[:-2]
    xr = xr.reshape((-1,) + xr.shape[-2:])
    xi = xi.reshape((-1,) + xi.shape[-2:])

    def one(zr, zi):
        with jax.enable_x64(False):
            zr, zi = _k1_call(zr, zi, f.u.reshape(1, -1),
                              f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
                              a, interpret, mode, variant=lead_variant)
            zr, zi = _k2_call(zr, zi, f, b, interpret, mode,
                              rows=k2_rows, variant=k2_variant)
            return _k3_call(zr, zi, a, interpret, mode,
                            variant=lead_variant)

    if xr.shape[0] > 1:
        # vmap (not lax.map): pallas_call's batching rule adds a grid dim
        our, oui = jax.vmap(one)(xr, xi)
    else:
        o = one(xr[0], xi[0])
        our, oui = o[0][None], o[1][None]
    return (our.reshape(lead + (n_az, n_rg)),
            oui.reshape(lead + (n_az, n_rg)))


def apply_csa_pallas(phist, f, interpret: bool = False, mode: str = "bf16x3"):
    """Fused-in-VMEM CSA: (..., n_az, n_rg) complex64 -> SLC, identical math
    to ops/csa.py::apply_csa_fused (f32 rounding differences only). Prefer
    :func:`apply_csa_pallas_planes` in hot paths (see its docstring)."""
    v = phist.view(jnp.float32).reshape(phist.shape + (2,))
    our, oui = apply_csa_pallas_planes(v[..., 0], v[..., 1], f,
                                       interpret=interpret, mode=mode)
    return jnp.stack([our, oui], axis=-1).reshape(
        our.shape[:-1] + (-1,)).view(jnp.complex64)
