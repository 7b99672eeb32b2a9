"""Pallas TPU kernel: fused range-compress + recentre + presum for fast BP.

ops/bp_fast.py::recenter_presum is three HBM round trips over the padded
(P, nfft) pulse block (forward FFT, ramp multiply, inverse FFT) plus the
presum reduction, with XLA's FFT running ~10x off the HBM bound
(docs/ROUND1_NOTES.md). This kernel does the whole chain in ONE pass:

  raw pulse -> four-step forward DFT (nfft = B1*B2, B1 = nfft/128 sublane
  digit, B2 = 128 lane digit) -> matched-filter multiply -> recentre shift
  ramp + carrier -> four-step inverse DFT -> presum accumulate,

all VMEM-resident per pulse, MXU block dots at full lane width, one HBM
read of the raw pulses and one write of the presummed output (d-times
smaller). The digit-swapped frequency layout (k, [m|m]) never needs a
transpose: the filter/ramp tables are host-built directly in that layout,
exactly like the CSA megakernel's pre-permuted Phi2 vector
(ops/pallas/csa_kernel.py).

Phase exactness without f64 (Mosaic has no f64): the recentre shift is
split host-side (f64) into integer + fractional samples. The integer part
becomes an EXACT i32 phase index (f * si mod N in integer arithmetic); the
fractional part satisfies |f*sf/N| <= 0.5 so f32 keeps ~1e-7 rad; the
carrier phase is wrapped mod 2pi in f64 host-side. This reproduces
recenter_presum's f64-wrapped ramps to f32 rounding.

Reference workload: the 2,500 x 22,004-sample VideoSAR frames of
sar_batch_sim.py:171-238.
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
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_TWO_PI = 2.0 * math.pi
_C = 299792458.0


def supported(nfft: int) -> bool:
    b1 = nfft // _LANE
    # i32-overflow audit of the factored recentre phase: the kernel's
    # exact integer products are k*si (peak (b1-1)*(nfft-1)) and
    # m*si (peak 127*(nfft-1), the m*B1*si term is pre-reduced mod B2) —
    # both must stay below INT32_MAX at the largest supported b1 = 512
    # (nfft = 65536); widening past that needs i64 phase accumulation.
    assert (512 - 1) * (512 * _LANE - 1) <= 2**31 - 1
    assert (_LANE - 1) * (512 * _LANE - 1) <= 2**31 - 1
    return nfft % _LANE == 0 and b1 * _LANE == nfft and 128 <= b1 <= 512 \
        and (b1 & (b1 - 1)) == 0


from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (roll_half as
                                                           _roll_half)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (split_pair as
                                                          _split_pair)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import (wblk_rhs as
                                                          _wblk_rhs)
from nis_sar_amtigmti_video_tpu.ops.pallas.blocks import blk_lhs as _blk_lhs


def _tables(nfft: int, ref_conj: np.ndarray | None, ns: int | None = None,
            out_rows: tuple[int, int] | None = None):
    """Host-side constants: DFT block matrices, the (k, q) four-step
    twiddles, the (k, [m|m]) frequency-value table and filter tables.

    ``ns`` slices the forward leading-DFT's weight columns to the rows a
    length-``ns`` input can populate (the zero-padded tail contributes
    nothing — 33% less forward MXU at the reference 22,004-sample pulse).
    ``out_rows=(p0, p1)`` slices the inverse leading-DFT's rows so only
    output samples [p0*128, p1*128) are computed — the fast-BP accumulate
    reads just the iso-range band (~38% of nfft), so the inverse dot and
    the HBM output shrink accordingly. Both slicings are exact."""
    b1 = nfft // _LANE
    b2 = _LANE
    j1 = np.arange(b1)
    j2 = np.arange(b2)
    f1 = np.exp(-2j * np.pi * np.outer(j1, j1) / b1)
    f2 = np.exp(-2j * np.pi * np.outer(j2, j2) / b2)
    w1_full = _blk_lhs(f1)
    if ns is not None:
        nsr = -(-ns // _LANE)
        cols = np.concatenate([np.arange(nsr), b1 + np.arange(nsr)])
        w1_full = w1_full[:, cols]
    w1 = _split_pair(w1_full)
    w1i_full = _blk_lhs(np.conj(f1).T / b1)
    if out_rows is not None:
        p0, p1 = out_rows
        rows = np.concatenate([np.arange(p0, p1), b1 + np.arange(p0, p1)])
        w1i_full = w1i_full[rows]
    w1i = _split_pair(w1i_full)
    w2 = _split_pair(_wblk_rhs(f2))
    w2i = _split_pair(_wblk_rhs(np.conj(f2).T / b2))

    th = 2.0 * np.pi * np.outer(j1, j2) / nfft            # (k, q)
    tw_r = np.cos(th).astype(np.float32)
    tw_i = np.sin(th).astype(np.float32)                  # forward: e^{-j th}

    # frequency layout after the forward pass: (k sublane, [m|m] lanes),
    # f = m*B1 + k, signed fftfreq order
    m = np.concatenate([j2, j2])[None, :]                 # (1, 2*B2)

    if ref_conj is not None:
        rv = ref_conj[(m % b2) * b1 + j1[:, None]]
        a_ref = np.tile(rv.real[:, :b2], (1, 2)).astype(np.float32)
        b_ref = np.concatenate([-rv.imag[:, :b2], rv.imag[:, :b2]],
                               axis=1).astype(np.float32)
    else:
        a_ref = np.ones((b1, 2 * b2), np.float32)
        b_ref = np.zeros((b1, 2 * b2), np.float32)
    return w1, w1i, w2, w2i, tw_r, tw_i, a_ref, b_ref


def _dot_l(wh, wl_, z, mode: str):
    """Leading-axis block dot W @ z (bf16x3-managed; shared by every
    kernel here — the split/fused bit-identity contract depends on ONE
    definition of the hi/lo term order)."""
    dd = partial(jnp.dot, preferred_element_type=jnp.float32)
    zh = z.astype(jnp.bfloat16)
    if mode == "bf16":
        return dd(wh, zh)
    zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
    return dd(wh, zh) + dd(wl_, zh) + dd(wh, zl)


def _dot_m(z, wh, wl_, mode: str):
    """Minor-axis block dot z @ W (bf16x3-managed, see :func:`_dot_l`)."""
    dd = partial(jnp.dot, preferred_element_type=jnp.float32)
    zh = z.astype(jnp.bfloat16)
    if mode == "bf16":
        return dd(zh, wh)
    zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
    return dd(zh, wh) + dd(zh, wl_) + dd(zl, wh)


def _kernel(xr, xi, si, sf, car, wl, w1h, w1l, w1ih, w1il, w2h, w2l,
            w2ih, w2il, tw_r, tw_i, a_ref, b_ref, out_r, out_i,
            *, d: int, groups: int, nfft: int, mode: str, pb: int = 0,
            unroll: bool = False):
    b1 = nfft // _LANE
    b2 = _LANE
    pb = pb or b1                   # inverse output rows (band-limited)
    dot_l = partial(_dot_l, mode=mode)
    dot_m = partial(_dot_m, mode=mode)

    isgn = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * b2), 1)
    hsgn = jnp.where(isgn >= b2, jnp.float32(1.0), jnp.float32(-1.0))
    # lane m-digit (same value on both [m|m] halves) for the factored ramp
    m_tab = jnp.where(isgn >= b2, isgn - b2, isgn)                # (1, 2B2)
    wrap_mask = m_tab >= b2 // 2          # f = m*B1 + k >= nfft/2 iff m >= 64

    def forward_spec(t):
        """Forward four-step + matched filter + recentre ramp/carrier;
        returns the pulse's processed spectrum in (k, [m|m]) layout."""
        z = jnp.concatenate([xr[t], xi[t]], axis=0)        # (2B1, B2)
        y = dot_l(w1h[:], w1l[:], z)                       # [k_re; k_im], q
        yr, yi = y[:b1], y[b1:]
        zr = yr * tw_r[:] + yi * tw_i[:]       # x e^{-j th}
        zi = yi * tw_r[:] - yr * tw_i[:]
        s = jnp.concatenate([zr, zi], axis=1)              # (B1, [q|q])
        s = dot_m(s, w2h[:], w2l[:])                       # (B1=k, [m|m])

        # ---- matched filter (host table) ----
        s = s * a_ref[:] + _roll_half(s) * b_ref[:]

        # ---- recentre ramp + carrier, FACTORED: the linear-in-f phase
        # theta*f_sgn + car splits over the digits f = m*B1 + k into
        # A(k) (carries the carrier) x B(m) x C^[f >= nfft/2], each with the
        # exact i32 + fractional decomposition — (B1 + B2 + 1) trig pairs
        # per pulse instead of B1*B2 (the round-2 kernel's dominant cost).
        si_t = si[t, 0]
        sf_t = sf[t, 0]
        k_io = jax.lax.broadcasted_iota(jnp.int32, (b1, 1), 0)
        pha_i = (k_io * si_t) % nfft                       # exact i32
        pha = (_TWO_PI / nfft) * (pha_i.astype(jnp.float32)
                                  + sf_t * k_io.astype(jnp.float32)) \
            + car[t, 0]
        ar, ai = jnp.cos(pha), jnp.sin(pha)                # (B1, 1)
        mb = m_tab * b1                                    # (1, 2B2) i32
        # (m*B1*si) mod nfft = B1*((m*si) mod B2): peak m*si = 127*(nfft-1)
        # = 8.3e6 — i32-safe for every supported nfft (the direct product
        # m*B1*si would overflow at nfft=65536)
        phb_i = b1 * ((m_tab * si_t) % b2)
        phb = (_TWO_PI / nfft) * (phb_i.astype(jnp.float32)
                                  + sf_t * mb.astype(jnp.float32))
        br, bi = jnp.cos(phb), jnp.sin(phb)                # (1, 2B2)
        cs = ar * br - ai * bi                             # (B1, 2B2)
        sn = ar * bi + ai * br
        # wrap factor C = e^{-j 2 pi sf} where f_sgn went negative
        phc = -_TWO_PI * sf_t
        cr, ci_ = jnp.cos(phc), jnp.sin(phc)
        cs, sn = (jnp.where(wrap_mask, cs * cr - sn * ci_, cs),
                  jnp.where(wrap_mask, cs * ci_ + sn * cr, sn))
        return (s * cs + _roll_half(s) * (sn * hsgn)) * (wl[t, 0] / d)

    for g in range(groups):
        # presum in the FREQUENCY domain (linear), so the inverse four-step
        # runs once per group instead of once per pulse
        if unroll:
            # unrolled: the per-pulse forward chains are INDEPENDENT until
            # this sum, but the fori_loop's carry serializes them — the
            # kernel is op-latency-bound (docs/ROUND3_NOTES the 'wide'
            # study), so letting Mosaic interleave the d chains is a
            # scheduling lever. Bit-identical sum order (0 + x == x).
            s = forward_spec(g * d)
            for j in range(1, d):
                s = s + forward_spec(g * d + j)
        else:
            def body(j, acc):
                return acc + forward_spec(g * d + j)
            s = jax.lax.fori_loop(0, d, body,
                                  jnp.zeros((b1, 2 * b2), jnp.float32))

        # ---- inverse four-step: iDFT_B2 over m, conj twiddle, iDFT_B1
        s = dot_m(s, w2ih[:], w2il[:])                     # (k, [q|q])
        a2 = jnp.concatenate([tw_r[:], tw_r[:]], axis=1)
        b2t = jnp.concatenate([tw_i[:], tw_i[:]], axis=1) * hsgn
        s = s * a2 + _roll_half(s) * b2t                   # e^{+j th}
        z2 = jnp.concatenate([s[:, :b2], s[:, b2:]], axis=0)   # (2B1, q)
        y2 = dot_l(w1ih[:], w1il[:], z2)                   # [p_re; p_im], q
        out_r[g] = y2[:pb]
        out_i[g] = y2[pb:]


def _kernel_wide(xr, xi, si, sf, car, wl, w1h, w1l, w1ih, w1il, w2h, w2l,
                 w2ih, w2il, twa, twb, twbi, a_ref3, b_ref3, out_r, out_i,
                 *, d: int, groups: int, nfft: int, mode: str, pb: int = 0):
    """Lane-batched variant of :func:`_kernel` (measured study, kept for
    the record — select with ``impl='wide'``).

    Hypothesis: the narrow kernel is op-latency-bound (~30 small dependent
    VPU/MXU ops per pulse), so batching every elementwise stage into ONE
    (B1, blk, [q_re|q_im]) 3-D op per grid step should win. Measured on
    v5e at the reference workload: 31.5 ms vs narrow's 27.6 — the
    jnp.stack re-assemblies around the per-pulse MXU dots cost more than
    the batching saves (scripts/probe_fftk_ablate.py has the stage split).
    Math verified identical to narrow (1.2e-6 relative on TPU)."""
    b1 = nfft // _LANE
    b2 = _LANE
    blk = d * groups
    pb = pb or b1                   # inverse output rows (band-limited)
    dot_l = partial(_dot_l, mode=mode)
    dot_m = partial(_dot_m, mode=mode)

    def rollh(x):
        return jnp.concatenate([x[..., b2:], x[..., :b2]], axis=-1)

    # ---- forward dot_l per pulse, assembled into the 3-D wide view ----
    segs = []
    for t in range(blk):
        z = jnp.concatenate([xr[t], xi[t]], axis=0)        # (2B1, B2)
        y = dot_l(w1h[:], w1l[:], z)
        segs.append(jnp.concatenate([y[:b1], y[b1:]], axis=-1))
    s3 = jnp.stack(segs, axis=1)                           # (B1, blk, 2B2)

    # ---- four-step twiddle e^{-j th}, all pulses at once ----
    s3 = s3 * twa[:][:, None, :] + rollh(s3) * twb[:][:, None, :]

    # ---- per-pulse lane DFT (B2 digit) ----
    s3 = jnp.stack([dot_m(s3[:, t], w2h[:], w2l[:]) for t in range(blk)],
                   axis=1)                                 # (B1, blk, [m|m])

    # ---- matched filter (static tables) ----
    s3 = s3 * a_ref3[:][:, None, :] + rollh(s3) * b_ref3[:][:, None, :]

    # ---- factored recentre ramp + carrier (trig on marginals only) ----
    isgn = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * b2), 2)
    hsgn = jnp.where(isgn >= b2, jnp.float32(1.0), jnp.float32(-1.0))
    m_tab = jnp.where(isgn >= b2, isgn - b2, isgn)         # (1, 1, 2B2)
    wrap_mask = m_tab >= b2 // 2
    si2 = si[0]                                            # (1, blk) i32
    sf2 = sf[0]
    k_io = jax.lax.broadcasted_iota(jnp.int32, (b1, 1), 0)
    pha_i = (k_io * si2) % nfft                            # (B1, blk) exact
    pha = (_TWO_PI / nfft) * (pha_i.astype(jnp.float32)
                              + sf2 * k_io.astype(jnp.float32)) + car[0]
    ar3 = jnp.cos(pha)[:, :, None]                         # (B1, blk, 1)
    ai3 = jnp.sin(pha)[:, :, None]
    si3 = si2[:, :, None]
    sf3 = sf2[:, :, None]
    phb_i = b1 * ((m_tab * si3) % b2)                      # (1, blk, 2B2)
    phb = (_TWO_PI / nfft) * (phb_i.astype(jnp.float32)
                              + sf3 * (m_tab * b1).astype(jnp.float32))
    br3 = jnp.cos(phb)
    bi3 = jnp.sin(phb)
    phc = -_TWO_PI * sf3
    cr3, ci3 = jnp.cos(phc), jnp.sin(phc)
    br3, bi3 = (jnp.where(wrap_mask, br3 * cr3 - bi3 * ci3, br3),
                jnp.where(wrap_mask, br3 * ci3 + bi3 * cr3, bi3))
    cs = ar3 * br3 - ai3 * bi3                             # (B1, blk, 2B2)
    sn = ar3 * bi3 + ai3 * br3
    s3 = s3 * cs + rollh(s3) * (sn * hsgn)

    # ---- presum in the frequency domain (linear) ----
    s3 = s3 * (wl[0][:, :, None] / d)
    sg = s3.reshape(b1, groups, d, 2 * b2).sum(axis=2)     # (B1, g, 2B2)

    # ---- inverse: lane iDFT, conj twiddle, leading iDFT ----
    sg = jnp.stack([dot_m(sg[:, g], w2ih[:], w2il[:]) for g in range(groups)],
                   axis=1)
    sg = sg * twa[:][:, None, :] + rollh(sg) * twbi[:][:, None, :]
    for g in range(groups):
        z2 = jnp.concatenate([sg[:, g, :b2], sg[:, g, b2:]], axis=0)
        y2 = dot_l(w1ih[:], w1il[:], z2)
        out_r[g] = y2[:pb]
        out_i[g] = y2[pb:]


def recenter_presum_pallas(rc, sat_pos, sat_vel, t_slow, vel_focus, p, d: int,
                           t_ref: float, filter_compress: bool = True,
                           mode: str = "bf16x3", groups: int = 2,
                           interpret: bool = False, t_mean=None,
                           impl: str = "narrow",
                           out_rows: tuple[int, int] | None = None,
                           unroll: bool = False):
    """Drop-in for ops/bp_fast.py::recenter_presum (optionally with the
    matched filter fused, the ``ref_conj`` path) running as one pallas
    kernel. Returns the same (rc2[P2, nfft] complex64, pos2, vel2, t2).

    ``out_rows=(p0, p1)`` band-limits the inverse transform: the returned
    rc2 then holds only samples [p0*128, p1*128) (shape (P2, (p1-p0)*128))
    — exact, just fewer output rows computed (the fast-BP accumulate reads
    only the iso-range band). The forward transform is always sliced to
    the ``ns`` populated input rows (exact: the zero tail contributes
    nothing)."""
    from nis_sar_amtigmti_video_tpu.ops.bp_fast import matched_filter_spectrum

    num_p, ns = rc.shape
    nfft = 1 << (ns - 1).bit_length()
    if not supported(nfft):
        raise ValueError(f"recenter_presum_pallas: nfft={nfft} unsupported")
    b1 = nfft // _LANE
    nsr = -(-ns // _LANE)
    if out_rows is not None:
        p0, p1 = out_rows
        if not (0 <= p0 < p1 <= b1):
            raise ValueError(f"out_rows {out_rows} outside [0, {b1}]")
        pb = p1 - p0
    else:
        pb = b1

    dt = t_slow - (jnp.mean(t_slow) if t_mean is None else t_mean)
    org = vel_focus[None, :] * dt[:, None]
    d0 = jnp.linalg.norm(sat_pos - org, axis=1)            # (P,) f64

    # pulse padding to whole presum groups x kernel blocks
    blk = d * groups
    p_pad = -(-num_p // blk) * blk
    wl = jnp.pad(jnp.ones((num_p,), jnp.float32),
                 (0, p_pad - num_p)).reshape(-1, 1)
    rc_p = jnp.pad(rc, ((0, p_pad - num_p), (0, nsr * _LANE - ns)))
    d0_p = jnp.pad(d0, (0, p_pad - num_p), mode="edge")

    # f64 host-side phase decomposition (tiny (P,) arrays)
    shift = (2.0 * d0_p / _C - t_ref) * p.fs_hz
    si = jnp.round(shift)
    sf = (shift - si).astype(jnp.float32).reshape(-1, 1)
    si = jnp.mod(si, nfft).astype(jnp.int32).reshape(-1, 1)
    car = _TWO_PI * (2.0 * p.fc_hz / _C) * d0_p
    car = (car - _TWO_PI * jnp.round(car / _TWO_PI)
           ).astype(jnp.float32).reshape(-1, 1)

    ref = None
    if filter_compress:
        ref = matched_filter_spectrum(p, nfft)
    (w1h, w1l), (w1ih, w1il), (w2h, w2l), (w2ih, w2il), tw_r, tw_i, \
        a_ref, b_ref = _tables(nfft, ref, ns=ns, out_rows=out_rows)

    # only the nsr populated sublane rows are shipped/dotted: the forward
    # weight columns were sliced to match in _tables
    xr = jnp.real(rc_p).astype(jnp.float32).reshape(p_pad, nsr, _LANE)
    xi = jnp.imag(rc_p).astype(jnp.float32).reshape(p_pad, nsr, _LANE)

    n_out = p_pad // d
    grid = (p_pad // blk,)
    bs_in = pl.BlockSpec((blk, nsr, _LANE), lambda i: (i, 0, 0))
    bs_w1 = pl.BlockSpec((2 * b1, 2 * nsr), lambda i: (0, 0))
    bs_w1i = pl.BlockSpec((2 * pb, 2 * b1), lambda i: (0, 0))
    bs_w2 = pl.BlockSpec((2 * _LANE, 2 * _LANE), lambda i: (0, 0))
    bs_f = pl.BlockSpec((b1, 2 * _LANE), lambda i: (0, 0))
    bs_out = pl.BlockSpec((groups, pb, _LANE), lambda i: (i, 0, 0))

    with jax.enable_x64(False):
        if impl == "wide":
            # wide scalar layout: one (1, blk) row per grid step
            def row(v):
                return v.reshape(-1, blk)[:, None, :]
            twa = np.concatenate([tw_r, tw_r], axis=1)       # (B1, 2B2)
            twb = np.concatenate([tw_i, -tw_i], axis=1)      # fwd e^{-j th}
            twbi = np.concatenate([-tw_i, tw_i], axis=1)     # inv e^{+j th}
            bs_sc = pl.BlockSpec((1, 1, blk), lambda i: (i, 0, 0))
            our, oui = pl.pallas_call(
                partial(_kernel_wide, d=d, groups=groups, nfft=nfft,
                        mode=mode, pb=pb),
                grid=grid,
                in_specs=[bs_in, bs_in, bs_sc, bs_sc, bs_sc, bs_sc,
                          bs_w1, bs_w1, bs_w1i, bs_w1i,
                          bs_w2, bs_w2, bs_w2, bs_w2,
                          bs_f, bs_f, bs_f, bs_f, bs_f],
                out_specs=[bs_out, bs_out],
                out_shape=[jax.ShapeDtypeStruct((n_out, pb, _LANE),
                                                jnp.float32)] * 2,
                compiler_params=_VMEM,
                interpret=interpret,
            )(xr, xi, row(si), row(sf), row(car), row(wl),
              w1h, w1l, w1ih, w1il, w2h, w2l, w2ih, w2il,
              twa, twb, twbi, a_ref, b_ref)
        else:
            bs_sc = pl.BlockSpec((blk, 1), lambda i: (i, 0))
            bs_tw = pl.BlockSpec((b1, _LANE), lambda i: (0, 0))
            our, oui = pl.pallas_call(
                partial(_kernel, d=d, groups=groups, nfft=nfft, mode=mode,
                        pb=pb, unroll=unroll),
                grid=grid,
                in_specs=[bs_in, bs_in, bs_sc, bs_sc, bs_sc, bs_sc,
                          bs_w1, bs_w1, bs_w1i, bs_w1i, bs_w2, bs_w2, bs_w2,
                          bs_w2, bs_tw, bs_tw, bs_f, bs_f],
                out_specs=[bs_out, bs_out],
                out_shape=[jax.ShapeDtypeStruct((n_out, pb, _LANE),
                                                jnp.float32)] * 2,
                compiler_params=_VMEM,
                interpret=interpret,
            )(xr, xi, si, sf, car, wl, w1h, w1l, w1ih, w1il, w2h, w2l,
              w2ih, w2il, tw_r, tw_i, a_ref, b_ref)

    rc_b = jax.lax.complex(our, oui).reshape(n_out, pb * _LANE)
    rc_b = rc_b[: -(-num_p // d)]

    ci = jnp.arange(rc_b.shape[0]) * d + (d // 2)
    ci = jnp.minimum(ci, num_p - 1)
    return rc_b, sat_pos[ci], sat_vel[ci], t_slow[ci]


def _kernel_fwd(xr, xi, w1h, w1l, w2h, w2l, tw_r, tw_i, a_ref, b_ref, out,
                *, blk: int, nfft: int, mode: str):
    """Forward four-step + matched filter only — the frame-INDEPENDENT half
    of :func:`_kernel`'s forward_spec (no recentre ramp, no carrier, no
    presum weight). Emits each pulse's processed spectrum in the
    (k, [m|m]) digit-swapped layout for :func:`_kernel_inv`."""
    b1 = nfft // _LANE
    b2 = _LANE
    dot_l = partial(_dot_l, mode=mode)
    dot_m = partial(_dot_m, mode=mode)

    for t in range(blk):
        z = jnp.concatenate([xr[t], xi[t]], axis=0)        # (2B1, B2)
        y = dot_l(w1h[:], w1l[:], z)
        yr, yi = y[:b1], y[b1:]
        zr = yr * tw_r[:] + yi * tw_i[:]
        zi = yi * tw_r[:] - yr * tw_i[:]
        s = jnp.concatenate([zr, zi], axis=1)
        s = dot_m(s, w2h[:], w2l[:])                       # (B1=k, [m|m])
        out[t] = s * a_ref[:] + _roll_half(s) * b_ref[:]


def _kernel_inv(sp, si, sf, car, wl, w1ih, w1il, w2ih, w2il, tw_r, tw_i,
                out_r, out_i, *, d: int, groups: int, nfft: int, mode: str,
                pb: int = 0, wide: bool = False):
    """Recentre ramp + carrier + frequency-domain presum + inverse
    four-step on cached spectra — the frame-DEPENDENT half of
    :func:`_kernel` (same factored-trig ramp, same output layout).

    ``wide=False`` (d*groups % 8 == 0): scalars arrive as (blk, 1) columns
    read with the dynamic sublane index — bit-identical to :func:`_kernel`.
    ``wide=True`` (any blk — the ring path, whose P %% blk == 0 constraint
    can exclude every 8-divisible blk): scalars arrive as (1, 1, blk) rows;
    Mosaic has no dynamic lane loads, so the presum loop statically
    unrolls."""
    b1 = nfft // _LANE
    b2 = _LANE
    pb = pb or b1
    dot_l = partial(_dot_l, mode=mode)
    dot_m = partial(_dot_m, mode=mode)

    isgn = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * b2), 1)
    hsgn = jnp.where(isgn >= b2, jnp.float32(1.0), jnp.float32(-1.0))
    m_tab = jnp.where(isgn >= b2, isgn - b2, isgn)                # (1, 2B2)
    wrap_mask = m_tab >= b2 // 2

    def ramped(t):
        s = sp[t]
        si_t = si[0, 0, t] if wide else si[t, 0]
        sf_t = sf[0, 0, t] if wide else sf[t, 0]
        k_io = jax.lax.broadcasted_iota(jnp.int32, (b1, 1), 0)
        pha_i = (k_io * si_t) % nfft
        pha = (_TWO_PI / nfft) * (pha_i.astype(jnp.float32)
                                  + sf_t * k_io.astype(jnp.float32)) \
            + (car[0, 0, t] if wide else car[t, 0])
        ar, ai = jnp.cos(pha), jnp.sin(pha)
        phb_i = b1 * ((m_tab * si_t) % b2)
        phb = (_TWO_PI / nfft) * (phb_i.astype(jnp.float32)
                                  + sf_t * (m_tab * b1).astype(jnp.float32))
        br, bi = jnp.cos(phb), jnp.sin(phb)
        cs = ar * br - ai * bi
        sn = ar * bi + ai * br
        phc = -_TWO_PI * sf_t
        cr, ci_ = jnp.cos(phc), jnp.sin(phc)
        cs, sn = (jnp.where(wrap_mask, cs * cr - sn * ci_, cs),
                  jnp.where(wrap_mask, cs * ci_ + sn * cr, sn))
        return (s * cs + _roll_half(s) * (sn * hsgn)) * (
            (wl[0, 0, t] if wide else wl[t, 0]) / d)

    for g in range(groups):
        if wide:
            # static unroll: the (1, 1, blk) scalar rows only allow
            # statically-indexed lane reads (no dynamic lane loads)
            s = jnp.zeros((b1, 2 * b2), jnp.float32)
            for j in range(d):
                s = s + ramped(g * d + j)
        else:
            def body(j, acc):
                return acc + ramped(g * d + j)
            s = jax.lax.fori_loop(0, d, body,
                                  jnp.zeros((b1, 2 * b2), jnp.float32))
        s = dot_m(s, w2ih[:], w2il[:])
        a2 = jnp.concatenate([tw_r[:], tw_r[:]], axis=1)
        b2t = jnp.concatenate([tw_i[:], tw_i[:]], axis=1) * hsgn
        s = s * a2 + _roll_half(s) * b2t
        z2 = jnp.concatenate([s[:, :b2], s[:, b2:]], axis=0)
        y2 = dot_l(w1ih[:], w1il[:], z2)
        out_r[g] = y2[:pb]
        out_i[g] = y2[pb:]


def forward_spectra_pallas(rc, p, filter_compress: bool = True,
                           mode: str = "bf16x3", blk: int = 8,
                           interpret: bool = False):
    """Frame-independent half of :func:`recenter_presum_pallas`: forward
    four-step DFT + matched filter per raw pulse, returned as (P, B1, 2*B2)
    f32 spectra in the kernel's digit-swapped (k, [m|m]) layout.

    VideoSAR CPIs overlap (80% by default: sar_batch_sim.py:244-252), so
    every pulse's forward transform serves ~5 frames; cache these spectra
    once per collect and form each frame with
    :func:`recentre_from_spectra_pallas` — only the recentre ramp, presum
    and inverse remain per-frame."""
    num_p, ns = rc.shape
    nfft = 1 << (ns - 1).bit_length()
    if not supported(nfft):
        raise ValueError(f"forward_spectra_pallas: nfft={nfft} unsupported")
    from nis_sar_amtigmti_video_tpu.ops.bp_fast import matched_filter_spectrum

    b1 = nfft // _LANE
    nsr = -(-ns // _LANE)
    ref = matched_filter_spectrum(p, nfft) if filter_compress else None
    (w1h, w1l), _, (w2h, w2l), _, tw_r, tw_i, a_ref, b_ref = \
        _tables(nfft, ref, ns=ns)

    p_pad = -(-num_p // blk) * blk
    rc_p = jnp.pad(rc, ((0, p_pad - num_p), (0, nsr * _LANE - ns)))
    xr = jnp.real(rc_p).astype(jnp.float32).reshape(p_pad, nsr, _LANE)
    xi = jnp.imag(rc_p).astype(jnp.float32).reshape(p_pad, nsr, _LANE)

    grid = (p_pad // blk,)
    bs_in = pl.BlockSpec((blk, nsr, _LANE), lambda i: (i, 0, 0))
    bs_w1 = pl.BlockSpec((2 * b1, 2 * nsr), lambda i: (0, 0))
    bs_w2 = pl.BlockSpec((2 * _LANE, 2 * _LANE), lambda i: (0, 0))
    bs_f = pl.BlockSpec((b1, 2 * _LANE), lambda i: (0, 0))
    bs_tw = pl.BlockSpec((b1, _LANE), lambda i: (0, 0))
    bs_out = pl.BlockSpec((blk, b1, 2 * _LANE), lambda i: (i, 0, 0))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_kernel_fwd, blk=blk, nfft=nfft, mode=mode),
            grid=grid,
            in_specs=[bs_in, bs_in, bs_w1, bs_w1, bs_w2, bs_w2,
                      bs_tw, bs_tw, bs_f, bs_f],
            out_specs=bs_out,
            out_shape=jax.ShapeDtypeStruct((p_pad, b1, 2 * _LANE),
                                           jnp.float32),
            compiler_params=_VMEM,
            interpret=interpret,
        )(xr, xi, w1h, w1l, w2h, w2l, tw_r, tw_i, a_ref, b_ref)
    return out[:num_p]


def recentre_from_spectra_pallas(spec, sat_pos, sat_vel, t_slow, vel_focus,
                                 p, d: int, t_ref: float,
                                 mode: str = "bf16x3", groups: int = 2,
                                 interpret: bool = False, t_mean=None,
                                 out_rows: tuple[int, int] | None = None,
                                 ring_offset=None):
    """Frame-dependent half of :func:`recenter_presum_pallas` on cached
    spectra from :func:`forward_spectra_pallas`: recentre ramp + carrier +
    frequency-domain presum + (optionally band-limited) inverse four-step.
    Same return contract as recenter_presum_pallas.

    ``ring_offset`` (traced i32 scalar, pulses, a multiple of ``d``): the
    spectra buffer is a RING — slot ``j`` holds chronological pulse
    ``(j - ring_offset) % P``. The streaming VideoSAR product advances the
    buffer by dynamic_update_slice (131 MB written per 500-pulse step)
    instead of re-concatenating the full ~655 MB window each frame; only
    the tiny per-pulse scalars roll into ring order here, and the ~9 MB
    presummed output rolls back to chronological order. Requires
    ``P % (d * groups) == 0`` (no pad row may interleave the ring)."""
    num_p = spec.shape[0]
    b1 = spec.shape[1]
    nfft = b1 * _LANE
    if not supported(nfft):
        raise ValueError(
            f"recentre_from_spectra_pallas: nfft={nfft} unsupported")
    if out_rows is not None:
        p0, p1 = out_rows
        if not (0 <= p0 < p1 <= b1):
            raise ValueError(f"out_rows {out_rows} outside [0, {b1}]")
        pb = p1 - p0
    else:
        pb = b1

    dt = t_slow - (jnp.mean(t_slow) if t_mean is None else t_mean)
    org = vel_focus[None, :] * dt[:, None]
    d0 = jnp.linalg.norm(sat_pos - org, axis=1)            # (P,) f64

    blk = d * groups
    p_pad = -(-num_p // blk) * blk
    if ring_offset is not None and p_pad != num_p:
        raise ValueError(
            f"ring_offset needs P % (d*groups) == 0 (a pad row would "
            f"interleave the ring): P={num_p}, d={d}, groups={groups}")
    wl = jnp.pad(jnp.ones((num_p,), jnp.float32),
                 (0, p_pad - num_p)).reshape(-1, 1)
    sp_p = (spec if p_pad == num_p
            else jnp.pad(spec, ((0, p_pad - num_p), (0, 0), (0, 0))))
    d0_p = jnp.pad(d0, (0, p_pad - num_p), mode="edge")

    shift = (2.0 * d0_p / _C - t_ref) * p.fs_hz
    si = jnp.round(shift)
    sf = (shift - si).astype(jnp.float32).reshape(-1, 1)
    si = jnp.mod(si, nfft).astype(jnp.int32).reshape(-1, 1)
    car = _TWO_PI * (2.0 * p.fc_hz / _C) * d0_p
    car = (car - _TWO_PI * jnp.round(car / _TWO_PI)
           ).astype(jnp.float32).reshape(-1, 1)
    if ring_offset is not None:
        # scalars are chronological; the spectra are in ring order — move
        # the scalars to ring slots (roll(x, off)[j] = x[(j - off) % P])
        si, sf, car = (jnp.roll(x, ring_offset, axis=0)
                       for x in (si, sf, car))

    _, (w1ih, w1il), _, (w2ih, w2il), tw_r, tw_i, _, _ = \
        _tables(nfft, None, out_rows=out_rows)

    # scalar layout: (blk, 1) sublane columns when Mosaic's block rule
    # (blk % 8 == 0) allows — bit-identical to the fused kernel — else the
    # wide (1, 1, blk) row layout, which works for ANY blk (a ring at
    # P=2500/d=4 can never provide an 8-divisible blk). On TPU the two
    # layouts produce identical results (probe_bp_stream: 0.0 rel-err);
    # XLA-CPU interpret shows FMA-fusion-level (~2e-6) differences, so the
    # wide path is gated to ring mode to keep the non-ring split's
    # bitwise-equality contract with the fused kernel.
    wide = ring_offset is not None and blk % 8 != 0
    if wide:
        def row(v):
            return v.reshape(-1, blk)[:, None, :]
        si, sf, car, wl = row(si), row(sf), row(car), row(wl)

    n_out = p_pad // d
    grid = (p_pad // blk,)
    bs_sp = pl.BlockSpec((blk, b1, 2 * _LANE), lambda i: (i, 0, 0))
    bs_sc = (pl.BlockSpec((1, 1, blk), lambda i: (i, 0, 0)) if wide
             else pl.BlockSpec((blk, 1), lambda i: (i, 0)))
    bs_w1i = pl.BlockSpec((2 * pb, 2 * b1), lambda i: (0, 0))
    bs_w2 = pl.BlockSpec((2 * _LANE, 2 * _LANE), lambda i: (0, 0))
    bs_tw = pl.BlockSpec((b1, _LANE), lambda i: (0, 0))
    bs_out = pl.BlockSpec((groups, pb, _LANE), lambda i: (i, 0, 0))

    with jax.enable_x64(False):
        our, oui = pl.pallas_call(
            partial(_kernel_inv, d=d, groups=groups, nfft=nfft, mode=mode,
                    wide=wide,
                    pb=pb),
            grid=grid,
            in_specs=[bs_sp, bs_sc, bs_sc, bs_sc, bs_sc,
                      bs_w1i, bs_w1i, bs_w2, bs_w2, bs_tw, bs_tw],
            out_specs=[bs_out, bs_out],
            out_shape=[jax.ShapeDtypeStruct((n_out, pb, _LANE),
                                            jnp.float32)] * 2,
            compiler_params=_VMEM,
            interpret=interpret,
        )(sp_p, si, sf, car, wl, w1ih, w1il, w2ih, w2il, tw_r, tw_i)

    rc_b = jax.lax.complex(our, oui).reshape(n_out, pb * _LANE)
    rc_b = rc_b[: -(-num_p // d)]
    if ring_offset is not None:
        # ring row m covers slots [m*d, (m+1)*d) — roll the presummed rows
        # (the small output) back to chronological order. ring_offset must
        # be a multiple of d so no presum group straddles the ring seam.
        rc_b = jnp.roll(rc_b, -(ring_offset // d), axis=0)
    # static index set — numpy keeps host-array callers (probes) traceable
    # and avoids a device gather when the trajectory is a jnp constant
    ci = np.minimum(np.arange(rc_b.shape[0]) * d + (d // 2), num_p - 1)
    return rc_b, sat_pos[ci], sat_vel[ci], t_slow[ci]


def fft_conv_pallas(fr, fi, filt, nfft: int,
                    out_rows: tuple[int, int] | None = None,
                    mode: str = "bf16x3", groups: int = 8,
                    interpret: bool = False):
    """Row-wise linear FFT convolution through the four-step kernel:

        ifft(fft(field, nfft) * filt)[p0*128 : p1*128]

    — the echo NUFFT backend's convolution (ops/echo_freq.py::synthesize)
    with the forward DFT, filter multiply and inverse DFT fused in ONE
    VMEM-resident pass per pulse instead of XLA's three HBM round trips.
    Same machinery as :func:`recenter_presum_pallas` with zero shift ramp,
    zero carrier and no presum (d=1); the filter rides the (k, [m|m])
    matched-filter tables.

    fr/fi: (P, L) f32 real/imag field rows, L <= nfft (the zero tail is
    never read: the forward weight columns are sliced to the populated
    rows). filt: (nfft,) complex host spectrum. Returns (out_r, out_i)
    (P, (p1-p0)*128) f32.
    """
    if not supported(nfft):
        raise ValueError(f"fft_conv_pallas: nfft={nfft} unsupported")
    if groups % 8:
        # the per-pulse scalar blocks are (groups, 1); Mosaic requires the
        # sublane block dim to be a multiple of 8 (or the full array dim)
        raise ValueError(f"fft_conv_pallas: groups={groups} must be a "
                         "multiple of 8")
    num_p, l_in = fr.shape
    if l_in > nfft:
        raise ValueError(f"field length {l_in} exceeds nfft={nfft}")
    b1 = nfft // _LANE
    nsr = -(-l_in // _LANE)
    if out_rows is not None:
        p0, p1 = out_rows
        if not (0 <= p0 < p1 <= b1):
            raise ValueError(f"out_rows {out_rows} outside [0, {b1}]")
        pb = p1 - p0
    else:
        pb = b1

    blk = groups
    p_pad = -(-num_p // blk) * blk
    wl = jnp.ones((p_pad, 1), jnp.float32)
    zi32 = jnp.zeros((p_pad, 1), jnp.int32)
    zf32 = jnp.zeros((p_pad, 1), jnp.float32)

    ref = np.asarray(filt, np.complex128)
    (w1h, w1l), (w1ih, w1il), (w2h, w2l), (w2ih, w2il), tw_r, tw_i, \
        a_ref, b_ref = _tables(nfft, ref, ns=l_in, out_rows=out_rows)

    def pad_in(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, p_pad - num_p), (0, nsr * _LANE - l_in))
                       ).reshape(p_pad, nsr, _LANE)

    grid = (p_pad // blk,)
    bs_in = pl.BlockSpec((blk, nsr, _LANE), lambda i: (i, 0, 0))
    bs_w1 = pl.BlockSpec((2 * b1, 2 * nsr), lambda i: (0, 0))
    bs_w1i = pl.BlockSpec((2 * pb, 2 * b1), lambda i: (0, 0))
    bs_w2 = pl.BlockSpec((2 * _LANE, 2 * _LANE), lambda i: (0, 0))
    bs_f = pl.BlockSpec((b1, 2 * _LANE), lambda i: (0, 0))
    bs_sc = pl.BlockSpec((blk, 1), lambda i: (i, 0))
    bs_tw = pl.BlockSpec((b1, _LANE), lambda i: (0, 0))
    bs_out = pl.BlockSpec((groups, pb, _LANE), lambda i: (i, 0, 0))

    with jax.enable_x64(False):
        our, oui = pl.pallas_call(
            partial(_kernel, d=1, groups=groups, nfft=nfft, mode=mode,
                    pb=pb),
            grid=grid,
            in_specs=[bs_in, bs_in, bs_sc, bs_sc, bs_sc, bs_sc,
                      bs_w1, bs_w1, bs_w1i, bs_w1i, bs_w2, bs_w2, bs_w2,
                      bs_w2, bs_tw, bs_tw, bs_f, bs_f],
            out_specs=[bs_out, bs_out],
            out_shape=[jax.ShapeDtypeStruct((p_pad, pb, _LANE),
                                            jnp.float32)] * 2,
            compiler_params=_VMEM,
            interpret=interpret,
        )(pad_in(fr), pad_in(fi), zi32, zf32, zf32, wl,
          w1h, w1l, w1ih, w1il, w2h, w2l, w2ih, w2il, tw_r, tw_i,
          a_ref, b_ref)
    return (our.reshape(p_pad, pb * _LANE)[:num_p],
            oui.reshape(p_pad, pb * _LANE)[:num_p])
