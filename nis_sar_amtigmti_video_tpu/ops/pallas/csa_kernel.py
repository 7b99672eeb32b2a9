"""Pallas TPU megakernel: fused CSA (FFTs + phase multiplies in VMEM).

The XLA CSA path (ops/csa.py::apply_csa_fused) is HBM-bound: each of the
four FFT passes and three phase multiplies is a separate round trip over the
(n_az x n_rg) complex image (~9 passes). This module runs the whole chain in
THREE pallas kernels — one HBM round trip each:

  K1  column blocks (n_az, 128): azimuth four-step FFT + Phi1 multiply
  K2  row blocks (128, n_rg):    range FFT -> Phi2 -> range IFFT -> Phi3,
                                 all VMEM-resident
  K3  column blocks (n_az, 128): azimuth inverse four-step FFT

FFTs are four-step factorizations N = A*A (A = sqrt(N)): two (A x A) DFT
matmuls on the MXU with an (A, A) twiddle multiply between. Axis handling:

  * K1/K3 contract the *leading* digit twice with a cheap sublane-side
    swapaxes(0, 1) between — output frequencies land in natural fftfreq
    order, so the CSA factor vectors need no permutation.
  * K2 contracts the middle/minor digits with lax.dot_general (no swap on
    the forward pass; its output is digit-swap scrambled, which only Phi2's
    range-frequency vector sees — passed pre-permuted). The inverse ends
    with one in-VMEM minor transpose back to natural order.

Complex data is carried as separate re/im f32 planes (Mosaic has no complex
dtype); phases are generated inline from the 1-D CsaFactors vectors (the
same decomposition as apply_csa_fused, ops/csa.py:129-145), so HBM sees no
phase grids at all.

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
_HI = jax.lax.Precision.HIGHEST


def _isqrt_ok(n: int) -> int:
    a = int(math.isqrt(n))
    return a if a * a == n and a % 8 == 0 else 0


def supported(n_az: int, n_rg: int) -> bool:
    return bool(_isqrt_ok(n_az)) and bool(_isqrt_ok(n_rg)) \
        and n_rg % _LANE == 0 and n_az % _LANE == 0


def _dft_consts(a: int, n: int):
    """(Fr, Fi, Tr, Ti) f32: A-point DFT matrix e^{-2pi i jk/A} and the
    N-point four-step twiddle e^{-2pi i cb/N} (all computed in f64)."""
    j = np.arange(a)
    f = np.exp(-2j * np.pi * np.outer(j, j) / a)
    t = np.exp(-2j * np.pi * np.outer(j, j) / n)
    return (f.real.astype(np.float32), f.imag.astype(np.float32),
            t.real.astype(np.float32), t.imag.astype(np.float32))


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _blk_matrix(mr: np.ndarray, mi: np.ndarray) -> np.ndarray:
    """Real (2A, 2A) block form [[Mr, -Mi], [Mi, Mr]] of a complex matrix:
    one full-width MXU matmul on leading-stacked [re; im] planes computes
    the complex product (same MACs as 4 quarter-width matmuls, but at full
    M=K=128 systolic utilization for A=64)."""
    top = np.concatenate([mr, -mi], axis=1)
    bot = np.concatenate([mi, mr], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


def _cdot_blk(wblk, zr, zi):
    """Leading-axis complex matmul via the block matrix: planes stacked on
    axis 0, one (2A, 2A) @ (2A, M) dot."""
    h = zr.shape[0]
    x2 = jnp.concatenate([zr, zi], axis=0)
    y2 = jnp.dot(wblk, x2, preferred_element_type=jnp.float32, precision=_HI)
    return y2[:h], y2[h:]


# --------------------------------------------------------------------------
# K1: azimuth forward FFT (leading axis) + Phi1
# --------------------------------------------------------------------------

def _fft_lead(zr, zi, wblk, tr_m, ti_m, tsgn, a: int, lane: int):
    """Leading-axis four-step transform with one sublane swap; block-matrix
    complex matmuls; twiddle sign ``tsgn`` (+1 fwd, -1 inv)."""
    n = a * a
    zr = zr.reshape(a, a * lane)
    zi = zi.reshape(a, a * lane)
    yr, yi = _cdot_blk(wblk, zr, zi)
    yr = yr.reshape(a, a, lane)
    yi = yi.reshape(a, a, lane)
    yr, yi = _cmul(yr, yi, tr_m[:][:, :, None], tsgn * ti_m[:][:, :, None])
    yr = jnp.swapaxes(yr, 0, 1).reshape(a, a * lane)
    yi = jnp.swapaxes(yi, 0, 1).reshape(a, a * lane)
    sr, si = _cdot_blk(wblk, yr, yi)
    return sr.reshape(n, lane), si.reshape(n, lane)


def _k1_body(xr, xi, u, c1, w, wblk, tr_m, ti_m, our, oui, *, a: int):
    lane = xr.shape[-1]
    sr, si = _fft_lead(xr[:], xi[:], wblk[:], tr_m, ti_m,
                       jnp.float32(1.0), a, lane)
    # Phi1 = exp(j * c1 * (u - w)^2) with c1, w per az frequency (natural
    # order), u per range sample
    du = u[:] - w[:]
    ph = c1[:] * du * du
    pr, pi = jnp.cos(ph), jnp.sin(ph)
    our[:], oui[:] = _cmul(sr, si, pr, pi)


def _k1_call(xr, xi, u, c1, w, a: int, interpret: bool):
    n = a * a
    n_rg = xr.shape[-1]
    fr_m, fi_m, tr_m, ti_m = _dft_consts(a, n)
    wblk = _blk_matrix(fr_m, fi_m)
    grid = (n_rg // _LANE,)
    bs_dat = pl.BlockSpec((n, _LANE), lambda j: (0, j))
    bs_u = pl.BlockSpec((1, _LANE), lambda j: (0, j))
    bs_az = pl.BlockSpec((n, 1), lambda j: (0, 0))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    return pl.pallas_call(
        partial(_k1_body, a=a),
        grid=grid,
        in_specs=[bs_dat, bs_dat, bs_u, bs_az, bs_az,
                  bs_blk, bs_c, bs_c],
        out_specs=[bs_dat, bs_dat],
        out_shape=[jax.ShapeDtypeStruct((n, n_rg), jnp.float32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xr, xi, u, c1, w, wblk, tr_m, ti_m)


# --------------------------------------------------------------------------
# K2: range FFT -> Phi2 -> range IFFT -> Phi3 (minor axis, one round trip)
# --------------------------------------------------------------------------

def _k2_body(xr, xi, frs, alpha, beta, u, cphase, rphase, g, c3,
             fr_m, fi_m, tr_m, ti_m, our, oui, *, b: int, rows: int):
    def dg(m_r, m_i, zr, zi, lhs_axis):
        """complex dot_general contracting zr/zi axis ``lhs_axis`` with the
        (b, b) matrix's axis 0; produced digit lands minor."""
        dn = (((lhs_axis,), (0,)), ((), ()))
        d = partial(jax.lax.dot_general, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=_HI)
        return (d(zr, m_r) - d(zi, m_i)), (d(zr, m_i) + d(zi, m_r))

    # ---- forward: (rows, Ba, Bb) -a-> (rows, b, c) -tw-> -b-> (rows, c, d)
    zr = xr[:]                                          # (rows, b, b)
    zi = xi[:]
    zr, zi = dg(fr_m[:], fi_m[:], zr, zi, 1)            # contract a -> (b, c)
    zr, zi = _cmul(zr, zi, tr_m[:][None, :, :], ti_m[:][None, :, :])
    zr, zi = dg(fr_m[:], fi_m[:], zr, zi, 1)            # contract b -> (c, d)

    # ---- Phi2 in the scrambled range-frequency order (frs pre-permuted)
    f2 = frs[:]                                         # (1, b, b)
    ph = (alpha[:] * f2 + beta[:]) * f2                 # (rows, b, b)
    zr, zi = _cmul(zr, zi, jnp.cos(ph), jnp.sin(ph))

    # ---- inverse: contract d -> (c, b), conj twiddle, contract c -> (b, a)
    inv = 1.0 / b
    zr, zi = dg(fr_m[:].T * inv, -fi_m[:].T * inv, zr, zi, 2)
    zr, zi = _cmul(zr, zi, tr_m[:][None, :, :], -ti_m[:][None, :, :])
    zr, zi = dg(fr_m[:].T * inv, -fi_m[:].T * inv, zr, zi, 1)
    zr = jnp.swapaxes(zr, 1, 2)                         # (b, a) -> natural
    zi = jnp.swapaxes(zi, 1, 2)

    # ---- Phi3 = rphase(az) + cphase(rg) + g(az)*dr(rg) - c3(az)*u(rg)^2
    dr = 0.5 * 299792458.0 * u[:]                       # (1, b, b)
    ph3 = (rphase[:] + cphase[:] + g[:] * dr
           - c3[:] * u[:] * u[:])
    our[:], oui[:] = _cmul(zr, zi, jnp.cos(ph3), jnp.sin(ph3))


def _k2_call(xr, xi, f, frs, b: int, interpret: bool):
    n = b * b
    n_az = xr.shape[0]
    rows = 64
    fr_m, fi_m, tr_m, ti_m = _dft_consts(b, n)
    grid = (n_az // rows,)
    # minor-dim splits are illegal inside Mosaic kernels: reshape to
    # (n_az, b, b) OUTSIDE (a free contiguous view) and use 3-D blocks
    bs_dat = pl.BlockSpec((rows, b, b), lambda i: (i, 0, 0))
    bs_rg = pl.BlockSpec((1, b, b), lambda i: (0, 0, 0))
    bs_az = pl.BlockSpec((rows, 1, 1), lambda i: (i, 0, 0))
    bs_c = pl.BlockSpec((b, b), lambda i: (0, 0))

    def sq(v):                                          # (n,) -> (1, b, b)
        return v.reshape(1, b, b)

    def col(v):                                         # (n_az,) -> (.,1,1)
        return v.reshape(-1, 1, 1)

    our, oui = pl.pallas_call(
        partial(_k2_body, b=b, rows=rows),
        grid=grid,
        in_specs=[bs_dat, bs_dat, bs_rg, bs_az, bs_az, bs_rg, bs_rg,
                  bs_az, bs_az, bs_az, bs_c, bs_c, bs_c, bs_c],
        out_specs=[bs_dat, bs_dat],
        out_shape=[jax.ShapeDtypeStruct((n_az, b, b), jnp.float32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xr.reshape(n_az, b, b), xi.reshape(n_az, b, b), sq(frs.reshape(-1)),
      col(f.alpha), col(f.beta), sq(f.u), sq(f.cphase),
      col(f.rphase), col(f.g), col(f.c3), fr_m, fi_m, tr_m, ti_m)
    return our.reshape(n_az, n), oui.reshape(n_az, n)


# --------------------------------------------------------------------------
# K3: azimuth inverse FFT (leading axis)
# --------------------------------------------------------------------------

def _k3_body(xr, xi, wblk, tr_m, ti_m, our, oui, *, a: int):
    lane = xr.shape[-1]
    our[:], oui[:] = _fft_lead(xr[:], xi[:], wblk[:], tr_m, ti_m,
                               jnp.float32(-1.0), a, lane)


def _k3_call(xr, xi, a: int, interpret: bool):
    n = a * a
    n_rg = xr.shape[-1]
    fr_m, fi_m, tr_m, ti_m = _dft_consts(a, n)
    inv = np.float32(1.0 / a)
    wblk = _blk_matrix(fr_m.T * inv, -fi_m.T * inv)
    grid = (n_rg // _LANE,)
    bs_dat = pl.BlockSpec((n, _LANE), lambda j: (0, j))
    bs_c = pl.BlockSpec((a, a), lambda j: (0, 0))
    bs_blk = pl.BlockSpec((2 * a, 2 * a), lambda j: (0, 0))
    return pl.pallas_call(
        partial(_k3_body, a=a),
        grid=grid,
        in_specs=[bs_dat, bs_dat, bs_blk, bs_c, bs_c],
        out_specs=[bs_dat, bs_dat],
        out_shape=[jax.ShapeDtypeStruct((n, n_rg), jnp.float32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xr, xi, wblk, tr_m, ti_m)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def _digit_swap_perm(n: int) -> np.ndarray:
    b = int(math.isqrt(n))
    p = np.arange(n)
    return (p % b) * b + p // b


def apply_csa_pallas_planes(xr, xi, f, interpret: bool = False):
    """Planes-native fused CSA: re/im f32 (..., n_az, n_rg) -> re/im SLC.

    This is the production entry: complex64<->plane conversions around the
    kernels provoke XLA's X64SplitHigh custom call, whose layout assignment
    can pick a transposed {0,2,1} parameter layout with 64x tile padding
    (8+ GB of HBM at 4096^2 batch 2 — the round-1 layout trap). Callers that
    already hold planes (the bench, the device-boundary convention of
    utils/cplx) should stay in planes end to end.
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

    # Phi2's range-frequency vector in K2's internally scrambled order
    frs = jnp.asarray(f.fr)[jnp.asarray(_digit_swap_perm(n_rg))]

    def one(zr, zi):
        with jax.enable_x64(False):
            zr, zi = _k1_call(zr, zi, f.u.reshape(1, -1),
                              f.c1.reshape(-1, 1), f.w.reshape(-1, 1),
                              a, interpret)
            zr, zi = _k2_call(zr, zi, f, frs.reshape(1, -1), b, interpret)
            return _k3_call(zr, zi, a, interpret)

    if xr.shape[0] > 1:
        # vmap (not lax.map): pallas_call's batching rule adds a grid dim
        our, oui = jax.vmap(one)(xr, xi)
    else:
        o = one(xr[0], xi[0])
        our, oui = o[0][None], o[1][None]
    return (our.reshape(lead + (n_az, n_rg)),
            oui.reshape(lead + (n_az, n_rg)))


def apply_csa_pallas(phist, f, interpret: bool = False):
    """Fused-in-VMEM CSA: (..., n_az, n_rg) complex64 -> SLC, identical math
    to ops/csa.py::apply_csa_fused (f32 rounding differences only). Prefer
    :func:`apply_csa_pallas_planes` in hot paths (see its docstring)."""
    v = phist.view(jnp.float32).reshape(phist.shape + (2,))
    our, oui = apply_csa_pallas_planes(v[..., 0], v[..., 1], f,
                                       interpret=interpret)
    return jnp.stack([our, oui], axis=-1).reshape(
        our.shape[:-1] + (-1,)).view(jnp.complex64)
