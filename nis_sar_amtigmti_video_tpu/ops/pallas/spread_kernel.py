"""Pallas TPU kernel for the dense NUFFT spreader's group windows.

ops/echo_freq.py::_spread_dense is the XLA version: per pulse chunk it
materializes a (pc, grp, B/grp, win) bf16 one-hot in HBM (the group
cell-selection matrix), reads it twice for the hi/lo value contraction and
once more per extra value set — ~100 MB of HBM traffic per pulse at the
full-scale ATI shape (5,035 targets, win = 4096), which round-3 probes
identified as the dense path's dominant bill (docs/ROUND3_NOTES.md §7).

This kernel never lets the one-hot exist outside VMEM. Per (pulse, group)
grid cell it

    builds the transposed one-hot (win, bg) from a broadcasted iota
    compare against the group's window-relative cells (one VPU pass in
    VMEM) -> contracts every value set's (2K, bg) taps against it on the
    MXU (A @ B^T form, hi/lo bf16 split, f32 accumulation) -> applies the
    per-tap lane rolls -> writes only the (2*n_sets, win) group window.

HBM traffic drops from ~(B*win) bf16 per pulse per read to the operands
themselves: (B) i32 cells + (B, 2K) f32 taps in, (grp, 2*n_sets, win) f32
windows out — two orders of magnitude less at the reference shape. The
row-placement stage (dynamic base offsets into the field) stays in XLA:
it touches only the already-small windows.

Numerics match the XLA path: the one-hot is exact in bf16 (entries are
0/1), values use the same hi/lo split and f32 accumulation, and the roll
accumulation order is identical (equality-tested in interpret mode,
tests/test_echo_freq.py). Reference behavior covered: the echo synthesis
feeding sar_ati_dcpa_sim_csa.py:46-103's full-scale two-channel scene.

Traced under jax.enable_x64(False) like every pallas kernel here (the
global x64 flag injects an i64 the Mosaic compiler cannot legalize).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# one M-stacked value dot per tile vs hi/lo (and per-set) dots — see
# _kernel; bit-identical, A/B'd by scripts/probe_echo_dense_stages.py
_M_STACK = True


def _kernel(c_ref, *refs, n_sets: int, k_taps: int):
    out_ref = refs[2 * n_sets]
    win = out_ref.shape[3]
    bg = c_ref.shape[3]

    # transposed one-hot (win, bg): row j selects the targets whose tap-0
    # cell is j. Dead/dropped targets carry cell -1 (matches no row). Built
    # once per (pulse, group) cell and shared by every value set.
    iota = jax.lax.broadcasted_iota(jnp.int32, (win, bg), 0)
    oh_t = (iota == c_ref[0, 0]).astype(jnp.bfloat16)

    # hi/lo bf16 halves split by the CALLER: splitting in-kernel lets
    # the Mosaic pipeline (compiled with allow_excess_precision) elide
    # the f32->bf16->f32 round trip, collapsing lo to ~0 and leaving
    # hi-only (bf16-grade) results — measured 2e-2-rms errors on v5e.
    # With _M_STACK, every set's hi AND lo halves stack on the M axis so
    # ONE dot serves them all: the MXU sees M = 4*n_sets*K rows instead of
    # 2K twice per set (M=16 left 7/8 of the systolic array idle at the
    # default W=8). Both paths are bit-identical (independent output rows,
    # same hi+lo add order); the flag exists only for the A/B probe.
    k2 = 2 * k_taps

    def dg(a):
        # contract bg against the transposed one-hot (A @ B^T — the
        # MXU-native form, no relayout of oh_t)
        return jax.lax.dot_general(
            a, oh_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (., win)

    if _M_STACK:
        stacked = jnp.concatenate(
            [refs[i][0, 0] for i in range(2 * n_sets)],
            axis=0)                                      # (2*n_sets*2K, bg)
        part_all = dg(stacked)

    rows = []
    for s in range(n_sets):
        if _M_STACK:
            part = part_all[2 * s * k2:(2 * s + 1) * k2] \
                + part_all[(2 * s + 1) * k2:(2 * s + 2) * k2]
        else:
            part = dg(refs[2 * s][0, 0]) + dg(refs[2 * s + 1][0, 0])
        acc_r = part[0:1]
        acc_i = part[k_taps:k_taps + 1]
        for k in range(1, k_taps):
            acc_r = acc_r + jnp.roll(part[k:k + 1], k, axis=1)
            acc_i = acc_i + jnp.roll(part[k_taps + k:k_taps + k + 1], k,
                                     axis=1)
        rows += [acc_r, acc_i]
    out_ref[0, 0] = jnp.concatenate(rows, axis=0)


def _kernel_qr(c_ref, *refs, n_sets: int, k_taps: int, nq: int):
    """Digit-factorized spread: window cell c = 128*q + r, so the (win, bg)
    one-hot factors as Oq (nq, bg) x Or (128, bg) per tap, and

        out2d[q, r] = sum_k sum_b (Oq_k[q, b] * v[k, b]) * Or_k[r, b]

    is ONE MXU dot with the taps folded into the contraction axis:
    LHS (4*K-variant rows x nq, k_taps*bg) @ RHS (128, k_taps*bg)^T.
    vs :func:`_kernel`: M = 128*n_sets instead of 16, N = 128, no
    per-tap lane rolls, and ~3x less one-hot build. out2d row-major IS
    the window, so the (n_rows*nq, 128) output block reshapes freely.

    Accumulation order differs from the roll chain (all taps ride one
    f32 MXU accumulator), so results are f32-rounding-class equal to the
    XLA dense path, not bit-identical like :func:`_kernel`."""
    out_ref = refs[2 * n_sets]
    bg = c_ref.shape[3]
    c = c_ref[0, 0]                                       # (1, bg) i32

    # 0/1 masks built arithmetically (1 - min(|d|, 1)), never as i1
    # vectors: Mosaic cannot relayout an i1 mask from the i32-compare
    # tiling to the bf16-select tiling ("Invalid relayout ... replicated
    # in destination", measured on v5e); multiplying by an exact 1/0 and
    # casting back to bf16 is lossless, so the semantics are unchanged
    qi = jax.lax.broadcasted_iota(jnp.int32, (nq, bg), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bg), 0)
    rhs, mqs = [], []
    for k in range(k_taps):
        # a masked target (c < 0) must drop at EVERY tap: c + k re-enters
        # the valid range for k >= 1, so pin it to -_LANE (qk = -1 at all
        # taps, never matching the 0..nq-1 digit iota)
        ck = jnp.where(c < 0, -_LANE, c + k)
        qk = ck // _LANE                                  # floor: -1 drops
        rk = ck - qk * _LANE
        mqs.append((1 - jnp.minimum(jnp.abs(qi - qk), 1))
                   .astype(jnp.float32))
        rhs.append((1 - jnp.minimum(jnp.abs(ri - rk), 1))
                   .astype(jnp.bfloat16))
    rhs_m = jnp.concatenate(rhs, axis=1)                  # (128, K*bg)

    lhs_rows = []
    for i in range(2 * n_sets):                           # set-major, hi/lo
        v = refs[i][0, 0]                                 # (2K, bg) bf16
        for f in range(2):                                # re, im
            lhs_rows.append(jnp.concatenate(
                [(mqs[k] * v[f * k_taps + k][None].astype(jnp.float32))
                 .astype(jnp.bfloat16)
                 for k in range(k_taps)], axis=1))        # (nq, K*bg)
    lhs_m = jnp.concatenate(lhs_rows, axis=0)
    part = jax.lax.dot_general(
        lhs_m, rhs_m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (., 128)

    blocks = []
    for s in range(n_sets):
        hi = part[4 * s * nq:(4 * s + 2) * nq]            # re rows, im rows
        lo = part[(4 * s + 2) * nq:(4 * s + 4) * nq]
        blocks.append(hi + lo)                            # (2*nq, 128)
    out_ref[0, 0] = jnp.concatenate(blocks, axis=0)


def spread_windows_pallas(c_ok, v_sets, win: int, interpret: bool = False,
                          qr: bool = False):
    """Group windows for :func:`ops.echo_freq._spread_dense`'s value sets.

    c_ok: (pc, grp, bg) i32 window-relative tap-0 cells, -1 for targets to
    drop (bg a 128-multiple; the wrapper in echo_freq pads).
    v_sets: list of (pc, grp, 2K, bg) f32 tap values ([re | im] stacked on
    the tap axis), all sets sharing one K. The hi/lo bf16 split happens
    HERE (outside the kernel) so the Mosaic pipeline cannot elide the
    rounding; the two bf16 halves together move the same HBM bytes as the
    f32 input would.
    Returns [(out_r, out_i)] per set, each (pc, grp, win) f32 — identical
    contract to the XLA one-hot + roll chain it replaces.

    qr=True selects the digit-factorized kernel (:func:`_kernel_qr` —
    f32-rounding-class equal rather than bit-identical).
    """
    pc, grp, bg = c_ok.shape
    k2 = v_sets[0].shape[2]
    if any(v.shape != (pc, grp, k2, bg) for v in v_sets):
        raise ValueError(
            "spread_windows_pallas needs every value set at the same "
            f"(pc, grp, 2K, bg) = {(pc, grp, k2, bg)}, got "
            f"{[v.shape for v in v_sets]}")
    if bg % _LANE or win % _LANE:
        raise ValueError(f"bg ({bg}) and win ({win}) must be 128-multiples")
    n_sets = len(v_sets)
    n_rows = 2 * n_sets

    halves = []
    for v in v_sets:
        vh = v.astype(jnp.bfloat16)
        halves.append(vh)
        halves.append((v - vh.astype(jnp.float32)).astype(jnp.bfloat16))

    # cells ride as (pc, grp, 1, bg): Mosaic requires the last two block
    # dims to be (8k, 128k) or equal to the array dims — a (1, 1, bg) block
    # of a (pc, grp, bg) array has sublane dim 1 != grp and fails to lower
    bs_c = pl.BlockSpec((1, 1, 1, bg), lambda i, g: (i, g, 0, 0))
    bs_v = pl.BlockSpec((1, 1, k2, bg), lambda i, g: (i, g, 0, 0))
    nq = win // _LANE
    # qr writes (n_rows*nq, 128) rows — out2d row-major IS the window, so
    # the reshape below is a free contiguous view
    o_shape = ((pc, grp, n_rows * nq, _LANE) if qr
               else (pc, grp, n_rows, win))
    bs_o = pl.BlockSpec((1, 1) + o_shape[2:], lambda i, g: (i, g, 0, 0))
    body = (partial(_kernel_qr, n_sets=n_sets, k_taps=k2 // 2, nq=nq)
            if qr else partial(_kernel, n_sets=n_sets, k_taps=k2 // 2))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            body,
            grid=(pc, grp),
            in_specs=[bs_c] + [bs_v] * (2 * n_sets),
            out_specs=bs_o,
            out_shape=jax.ShapeDtypeStruct(o_shape, jnp.float32),
            compiler_params=_VMEM,
            interpret=interpret,
        )(c_ok[:, :, None, :], *halves)
    if qr:
        out = out.reshape(pc, grp, n_rows, win)
    return [(out[:, :, 2 * s], out[:, :, 2 * s + 1]) for s in range(n_sets)]
