"""Pallas TPU kernel: CSA K3 with the GMTI product step fused into its
output pass.

The composed GMTI CPI (2x csa_kernel K1/K2/K3 then gmti/fused.py's
product step) spends ~4 ms/CPI re-reading the two freshly written 4096^2
SLCs to form balance/ATI/DPCA/CFAR products. This kernel removes those
round trips by computing the products while the SLC tiles are still in
VMEM, riding K3's column-block grid:

  K3g  inputs:  both channels' K2 outputs (f32 planes) + the balance
                rotation (cos, sin) as a scalar operand
       compute: azimuth inverse four-step FFT for BOTH channels
       outputs: s1/s2 SLC planes, ATI phase (unmasked), |s1|^2,
                per-tile max|s1|^2 partials, DPCA power |s1 - s2 rot|^2,
                and the CFAR *azimuth* box sums of that power (outer and
                inner windows) — the in-tile-complete half of the
                separable CFAR window

The two cross-tile stages that cannot ride the tile write stay in XLA but
become cheap:

  * the balance phase needs a full-image reduction BEFORE the products —
    normally a serializing re-read of the SLCs. K1 and K2 are unitary up
    to a positive scale (K1 = Phi1 . W_az with W^H W = N I; K2 =
    Phi3 . Winv . Phi2 . Wf with Winv^H Winv Wf^H Wf-> exactly I), and
    K3^H K3 = I/N_az, so sum(s1 conj s2) over pixels equals a positive
    scale times the same sum over the RAW phase-history pair. angle() is
    scale-invariant, so cal comes from one reduction over the raw input,
    issued before K3g with no dependency on the SLCs
    (tests/test_gmti.py::TestFusedKernel asserts this against the
    post-image reduction).
  * the CFAR *range* box sums (lane-crossing) run as 1-D reduce_windows
    over the kernel's column-sum outputs, and the training-cell counts
    are the analytic rank-1 form (gmti/cfar.py::_box_count).

Products match gmti/fused.py::gmti_product_step to f32 rounding (the
balance reduction is ordered differently; the mask threshold compares
against a per-tile-max reduction of identical values).

Reference products: /root/reference/sar_ati_dcpa_sim_csa.py:398-419.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (split_pair as
                                                          _split_pair)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import blk_lhs as _blk_lhs
from nis_sar_amtigmti_video_tpu.ops.pallas.csa_kernel import (_cmul,
                                                              _dft_consts,
                                                              _fft_lead)

_LANE = 128
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _atan2(y, x):
    """Four-quadrant arctangent on the VPU — Mosaic lowers neither atan2
    nor atan, so this is the Cephes atanf recipe inline: octant fold to
    [0, 1], tan(pi/8) reduction, degree-7 odd minimax polynomial (~1 ulp
    f32), then quadrant fix-ups. Two divides + ~10 mul-adds per element;
    x = y = 0 returns 0."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, jnp.float32(1e-38))          # [0, 1]
    big = z > jnp.float32(0.41421356)                     # tan(pi/8)
    zr = jnp.where(big, (z - 1.0) / (z + 1.0), z)
    s = zr * zr
    p = (((jnp.float32(8.05374449538e-2) * s
           - jnp.float32(1.38776856032e-1)) * s
          + jnp.float32(1.99777106478e-1)) * s
         - jnp.float32(3.33329491539e-1)) * s * zr + zr
    p = jnp.where(big, p + jnp.float32(0.7853981633974483), p)
    r = jnp.where(ay > ax, jnp.float32(1.5707963267948966) - p, p)
    r = jnp.where(x < 0, jnp.float32(math.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _shift_up(x, k: int):
    """Rows i of the result read x[i+k]; vacated tail rows are zero (the
    zero-padding convention of lax.reduce_window)."""
    if k == 0:
        return x
    z = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x[k:], z], axis=0)


def _col_box(x, half: int):
    """Centered (2*half+1)-tap box sum along axis 0 with zero padding, as
    O(log w) shifted adds (doubling forward sums over a head-padded copy —
    a plain recentering shift would zero the top rows instead of giving
    them their truncated-window partial sums)."""
    w = 2 * half + 1
    pad = (half + 7) // 8 * 8          # sublane-aligned zero head
    n = x.shape[0]
    xp = jnp.concatenate([jnp.zeros((pad,) + x.shape[1:], x.dtype), x],
                         axis=0)
    # forward sums s_k[i] = sum_{d<k} xp[i+d] for k = powers of two
    sums = {1: xp}
    k = 1
    while 2 * k <= w:
        sums[2 * k] = sums[k] + _shift_up(sums[k], k)
        k *= 2
    # compose w from its binary digits
    acc = None
    off = 0
    rem = w
    bit = k
    while bit >= 1:
        if rem >= bit:
            term = _shift_up(sums[bit], off)
            acc = term if acc is None else acc + term
            off += bit
            rem -= bit
        bit //= 2
    return acc[pad - half:pad - half + n]


def _balance_body(x1r, x1i, x2r, x2i, osum):
    """One-pass cross-channel balance reduction: per lane-block partial
    sums of re/im(sum x1 conj x2), accumulated across grid steps in one
    revisited (8, 2*LANE) block ([.., :LANE] = re, [.., LANE:] = im)."""
    j = pl.program_id(0)
    a1r, a1i, a2r, a2i = x1r[:], x1i[:], x2r[:], x2i[:]
    pr = a1r * a2r + a1i * a2i
    pi = a1i * a2r - a1r * a2i
    # keep the reduction partially vectorized: collapse sublanes only, so
    # the cross-lane tree stays out of the inner loop (summed in XLA)
    row = jnp.concatenate([jnp.sum(pr, axis=0, keepdims=True),
                           jnp.sum(pi, axis=0, keepdims=True)], axis=1)
    blk = jnp.broadcast_to(row, (8, 2 * _LANE)) * jnp.float32(0.125)

    @pl.when(j == 0)
    def _init():
        osum[:] = blk

    @pl.when(j != 0)
    def _acc():
        osum[:] = osum[:] + blk


def raw_balance_pallas(x1r, x1i, x2r, x2i, interpret: bool = False):
    """angle(sum x1 conj x2) inputs in ONE HBM pass over the four raw
    planes (the XLA twin reduction costs ~1.4 ms of the 16.5 ms GMTI CPI
    at 4096^2). Returns (xs_re, xs_im) f32 scalars; the caller applies
    arctan2. Same value class as the jnp reduction (f32 partial sums,
    different association order)."""
    n, n_rg = x1r.shape
    grid = (n_rg // _LANE,)
    bs = pl.BlockSpec((n, _LANE), lambda j: (0, j))
    bs_o = pl.BlockSpec((8, 2 * _LANE), lambda j: (0, 0))
    out = pl.pallas_call(
        _balance_body,
        grid=grid,
        in_specs=[bs] * 4,
        out_specs=bs_o,
        out_shape=jax.ShapeDtypeStruct((8, 2 * _LANE), jnp.float32),
        compiler_params=_VMEM,
        interpret=interpret,
    )(x1r, x1i, x2r, x2i)
    return jnp.sum(out[:, :_LANE]), jnp.sum(out[:, _LANE:])


def phi1_tables(f):
    """Precomputed Phi1 cos/sin planes for :func:`k1_gmti_planes`.

    Phi1 = exp(j c1(az) (u(rg) - w(az))^2) is data-independent, and the
    round-5 K1g bill probe measured its in-kernel evaluation at ~1.0 ms
    of the 4.7 ms pass (0.8 ms transcendentals) while reading the two
    precomputed (n_az, n_rg) f32 planes costs ~0.3 ms of HBM
    (scripts/probe_k5_r5.py: 4.46 -> 3.61 ms). Build ONCE per factor set
    (outside the streaming jit) and pass via ``phi1_table=``; tables are
    f32 (XLA cos/sin vs Mosaic's differ at the 1e-7 class — inside every
    fidelity budget, gated by tests/test_gmti.py)."""
    ph = (jnp.asarray(f.c1).reshape(-1, 1).astype(jnp.float32)
          * (jnp.asarray(f.u).reshape(1, -1).astype(jnp.float32)
             - jnp.asarray(f.w).reshape(-1, 1).astype(jnp.float32)) ** 2)
    return jnp.cos(ph), jnp.sin(ph)


def _k1g_body(x1r, x1i, x2r, x2i, *refs,
              a: int, mode: str, variant: str, balance: bool,
              table: bool = False):
    """Two-channel CSA K1 (azimuth four-step FFT + Phi1) with the raw
    balance reduction riding the same tile read.

    The composed path runs K1 once per channel plus a third pass
    (raw_balance_pallas) over the same four raw planes. Here both channels
    share one grid step — the Phi1 cos/sin and the DFT/twiddle tables are
    computed/fetched once for two channels, there are no stack/unstack HBM
    copies (the measured cost of the vmapped batching dead end,
    docs/ROUND3_NOTES.md §3), and the balance partials accumulate into a
    revisited block exactly as in :func:`raw_balance_pallas` while the raw
    tiles are already in VMEM.

    ``table=True`` replaces the (u, c1, w) Phi1 refs with precomputed
    (cos, sin) plane refs (see :func:`phi1_tables`)."""
    if table:
        pcs, psn, wh, wl, tr_m, ti_m, o1r, o1i, o2r, o2i, obal = refs
        u = c1 = w = None
    else:
        u, c1, w, wh, wl, tr_m, ti_m, o1r, o1i, o2r, o2i, obal = refs
    lane = x1r.shape[-1]
    if balance:
        pr = x1r[:] * x2r[:] + x1i[:] * x2i[:]
        pi = x1i[:] * x2r[:] - x1r[:] * x2i[:]
        row = jnp.concatenate([jnp.sum(pr, axis=0, keepdims=True),
                               jnp.sum(pi, axis=0, keepdims=True)], axis=1)
        blk = jnp.broadcast_to(row, (8, 2 * _LANE)) * jnp.float32(0.125)
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
            obal[:] = jnp.zeros((8, 2 * _LANE), jnp.float32)

    if table:
        pr1, pi1 = pcs[:], psn[:]    # precomputed Phi1 cos/sin planes
    else:
        du = u[:] - w[:]
        ph = c1[:] * du * du
        pr1, pi1 = jnp.cos(ph), jnp.sin(ph)
    for xr, xi, our, oui in ((x1r, x1i, o1r, o1i), (x2r, x2i, o2r, o2i)):
        sr, si = _fft_lead(xr[:], xi[:], wh[:], wl[:], tr_m[:], ti_m[:],
                           jnp.float32(1.0), a, lane, mode, variant=variant)
        our[:], oui[:] = _cmul(sr, si, pr1, pi1)


def k1_gmti_planes(x1r, x1i, x2r, x2i, f, *, interpret: bool = False,
                   mode: str = "bf16x3", lead_variant: str = "swap",
                   balance: bool = True, phi1_table=None):
    """Two-channel K1 + raw balance in one pallas pass.

    Returns (z1r, z1i, z2r, z2i, xs_re, xs_im) — the K1 outputs of both
    channels plus the re/im of sum(x1 conj x2) over the raw pair (zeros
    when balance=False).

    ``phi1_table``: optional (cos, sin) planes from :func:`phi1_tables` —
    the streaming production path's table-read Phi1 (saves the ~0.8 ms
    in-kernel transcendental bill; see phi1_tables docstring). None keeps
    the self-contained in-kernel trig."""
    n_az, n_rg = x1r.shape
    a = int(math.isqrt(n_az))
    f_m, t_m = _dft_consts(a, n_az)
    wh, wl = _split_pair(_blk_lhs(f_m))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    grid = (n_rg // _LANE,)
    bs_dat = pl.BlockSpec((n_az, _LANE), lambda j: (0, j))
    bs_u = pl.BlockSpec((1, _LANE), lambda j: (0, j))
    bs_az = pl.BlockSpec((n_az, 1), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    bs_bal = pl.BlockSpec((8, 2 * _LANE), lambda j: (0, 0))
    big = jax.ShapeDtypeStruct((n_az, n_rg), jnp.float32)
    if phi1_table is None:
        phi_specs = [bs_u, bs_az, bs_az]
        phi_args = (f.u.reshape(1, -1), f.c1.reshape(-1, 1),
                    f.w.reshape(-1, 1))
        table = False
    else:
        # the (u, w) ref slots carry the cos/sin planes; c1 is dropped
        phi_specs = [bs_dat, bs_dat]
        phi_args = (phi1_table[0], phi1_table[1])
        table = True
    with jax.enable_x64(False):
        o = pl.pallas_call(
            partial(_k1g_body, a=a, mode=mode, variant=lead_variant,
                    balance=balance, table=table),
            grid=grid,
            in_specs=[bs_dat] * 4 + phi_specs + [bs_blk, bs_blk,
                                                 bs_c, bs_c],
            out_specs=[bs_dat] * 4 + [bs_bal],
            out_shape=[big] * 4
            + [jax.ShapeDtypeStruct((8, 2 * _LANE), jnp.float32)],
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=_VMEM,
            interpret=interpret,
        )(x1r, x1i, x2r, x2i, *phi_args, wh, wl, tr_m, ti_m)
    bal = o[4]
    return o[0], o[1], o[2], o[3], jnp.sum(bal[:, :_LANE]), \
        jnp.sum(bal[:, _LANE:])


def _k3g_body(x1r, x1i, x2r, x2i, cal, wh, wl, tr_m, ti_m,
              o1r, o1i, o2r, o2i, oph, omg, opw, ocso, ocsi, opk,
              *, a: int, mode: str, h_out: int, h_in: int, variant: str):
    lane = x1r.shape[-1]
    neg = jnp.float32(-1.0)
    s1r, s1i = _fft_lead(x1r[:], x1i[:], wh[:], wl[:], tr_m[:], ti_m[:],
                         neg, a, lane, mode, variant=variant)
    s2r, s2i = _fft_lead(x2r[:], x2i[:], wh[:], wl[:], tr_m[:], ti_m[:],
                         neg, a, lane, mode, variant=variant)
    o1r[:], o1i[:] = s1r, s1i
    o2r[:], o2i[:] = s2r, s2i

    cr = cal[0, 0:1]                      # (1,) broadcasts over (N, lane)
    ci = cal[0, 1:2]
    # interf = s1 conj(s2) e^{-j cal}
    pr = s1r * s2r + s1i * s2i
    pi = s1i * s2r - s1r * s2i
    ir_ = pr * cr + pi * ci
    ii_ = pi * cr - pr * ci
    oph[:] = _atan2(ii_, ir_)

    mag = s1r * s1r + s1i * s1i
    omg[:] = mag
    # running max across grid steps in a single revisited (8, 128) block
    j = pl.program_id(0)
    m = jnp.max(mag)

    @pl.when(j == 0)
    def _init():
        opk[:] = jnp.full((8, _LANE), m, jnp.float32)

    @pl.when(j != 0)
    def _acc():
        opk[:] = jnp.maximum(opk[:], m)

    # diff = s1 - s2 e^{j cal}
    dr_ = s1r - (s2r * cr - s2i * ci)
    di_ = s1i - (s2r * ci + s2i * cr)
    pw = dr_ * dr_ + di_ * di_
    opw[:] = pw
    ocso[:] = _col_box(pw, h_out)
    ocsi[:] = _col_box(pw, h_in)


def _k3g_call(x1r, x1i, x2r, x2i, cal, a: int, h_out: int, h_in: int,
              interpret: bool, mode: str, variant: str = "swap"):
    n = a * a
    n_rg = x1r.shape[-1]
    f_m, t_m = _dft_consts(a, n)
    inv = np.conj(f_m).T / a
    wh, wl = _split_pair(_blk_lhs(inv))
    tr_m = t_m.real.astype(np.float32)
    ti_m = t_m.imag.astype(np.float32)
    grid = (n_rg // _LANE,)
    bs_dat = pl.BlockSpec((n, _LANE), lambda j: (0, j))
    bs_cal = pl.BlockSpec((1, 2), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    bs_pk = pl.BlockSpec((8, _LANE), lambda j: (0, 0))
    big = jax.ShapeDtypeStruct((n, n_rg), jnp.float32)
    return pl.pallas_call(
        partial(_k3g_body, a=a, mode=mode, h_out=h_out, h_in=h_in,
                variant=variant),
        grid=grid,
        in_specs=[bs_dat] * 4 + [bs_cal, bs_blk, bs_blk, bs_c, bs_c],
        out_specs=[bs_dat] * 9 + [bs_pk],
        out_shape=[big] * 9
        + [jax.ShapeDtypeStruct((8, _LANE), jnp.float32)],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=_VMEM,
        interpret=interpret,
    )(x1r, x1i, x2r, x2i, cal, wh, wl, tr_m, ti_m)


def _lane_shift_up(x, k: int):
    """result[..., i] = x[..., i+k]; vacated tail lanes are zero."""
    if k == 0:
        return x
    z = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
    return jnp.concatenate([x[..., k:], z], axis=-1)


def _lane_box(x, half: int):
    """Centered (2*half+1)-tap box sum along the LAST axis with zero
    padding — the lane-axis twin of :func:`_col_box` (doubling forward
    sums over a head-padded copy)."""
    w = 2 * half + 1
    pad = -(-half // _LANE) * _LANE          # lane-aligned zero head
    n = x.shape[-1]
    xp = jnp.concatenate([jnp.zeros(x.shape[:-1] + (pad,), x.dtype), x],
                         axis=-1)
    sums = {1: xp}
    k = 1
    while 2 * k <= w:
        sums[2 * k] = sums[k] + _lane_shift_up(sums[k], k)
        k *= 2
    acc = None
    off = 0
    rem = w
    bit = k
    while bit >= 1:
        if rem >= bit:
            term = _lane_shift_up(sums[bit], off)
            acc = term if acc is None else acc + term
            off += bit
            rem -= bit
        bit //= 2
    return acc[..., pad - half:pad - half + n]


def _k4_body(cso, csi, pw, ph, mag, thr, ch_o, ch_i, cw_o, cw_i,
             osnr, oph, odm, onoise, *, h_out: int, h_in: int):
    """Single-pass GMTI epilogue: the range (lane-axis) halves of the
    separable CFAR box sums + analytic training counts + noise/SNR, the
    peak-referenced phase mask, and dmag = sqrt(power) — one HBM read of
    each K3g product plane and one write of each output, replacing the
    ~12 XLA plane passes (reduce_windows + elementwise chain) the
    composed epilogue cost (round-5; scripts/probe_gmti_epilogue.py)."""
    outer = _lane_box(cso[:], h_out)
    inner = _lane_box(csi[:], h_in)
    n_train = jnp.maximum(ch_o[:] * cw_o[:] - ch_i[:] * cw_i[:],
                          jnp.float32(1.0))
    noise = (outer - inner) / n_train
    onoise[:] = noise
    osnr[:] = pw[:] / jnp.maximum(noise, jnp.float32(1e-30))
    oph[:] = jnp.where(mag[:] > thr[0, 0], ph[:], jnp.float32(0.0))
    odm[:] = jnp.sqrt(pw[:])


def k4_epilogue_planes(cso, csi, power, ph_raw, mag, thr_scalar, *,
                       h_out: int, h_in: int, interpret: bool = False,
                       rows: int = 128):
    """(snr, phase_masked, dmag, noise) from K3g's product planes in one
    pallas pass over full range rows (no cross-block halo: each grid step
    holds complete rows, so the lane-axis box sums close locally).

    The azimuth (sublane) halves of the box sums were already applied in
    K3g (:func:`_col_box`); training-cell counts use the exact rank-1
    form (cfar._box_count's 1-D factors, passed as vectors).
    thr_scalar = mask_threshold^2 * peak2 (the XLA-reduced global peak).
    Matches the composed epilogue to f32 rounding (the lane box sum
    associates differently than reduce_window)."""
    from nis_sar_amtigmti_video_tpu.gmti.cfar import _count_1d

    n_az, n_rg = cso.shape
    while n_az % rows:
        rows //= 2
    grid = (n_az // rows,)
    bs_dat = pl.BlockSpec((rows, n_rg), lambda i: (i, 0))
    bs_thr = pl.BlockSpec((1, 1), lambda i: (0, 0))
    bs_col = pl.BlockSpec((rows, 1), lambda i: (i, 0))
    bs_row = pl.BlockSpec((1, n_rg), lambda i: (0, 0))
    ch_o = _count_1d(n_az, h_out).reshape(n_az, 1)
    ch_i = _count_1d(n_az, h_in).reshape(n_az, 1)
    cw_o = _count_1d(n_rg, h_out).reshape(1, n_rg)
    cw_i = _count_1d(n_rg, h_in).reshape(1, n_rg)
    big = jax.ShapeDtypeStruct((n_az, n_rg), jnp.float32)
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_k4_body, h_out=h_out, h_in=h_in),
            grid=grid,
            in_specs=[bs_dat] * 5 + [bs_thr, bs_col, bs_col, bs_row,
                                     bs_row],
            out_specs=[bs_dat] * 4,
            out_shape=[big] * 4,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=_VMEM,
            interpret=interpret,
        )(cso, csi, power, ph_raw, mag,
          thr_scalar.reshape(1, 1).astype(jnp.float32),
          ch_o.astype(jnp.float32), ch_i.astype(jnp.float32),
          cw_o.astype(jnp.float32), cw_i.astype(jnp.float32))


def k3_gmti_planes(x1r, x1i, x2r, x2i, cal_cos_sin, *, h_out: int,
                   h_in: int, interpret: bool = False, mode: str = "bf16x3",
                   lead_variant: str = "swap"):
    """Inverse azimuth four-step FFT of both channels' K2 outputs with the
    GMTI products fused into the tile write.

    Returns (s1r, s1i, s2r, s2i, phase_unmasked, mag1_sq, power,
    colsum_outer, colsum_inner, peak) — peak is an (8, 128) block whose
    entries all equal max|s1|^2 (the revisited-block reduction)."""
    n_az = x1r.shape[-2]
    a = int(math.isqrt(n_az))
    with jax.enable_x64(False):
        return _k3g_call(x1r, x1i, x2r, x2i, cal_cos_sin, a, h_out, h_in,
                         interpret, mode, variant=lead_variant)
