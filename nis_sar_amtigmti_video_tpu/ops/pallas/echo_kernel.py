"""Pallas TPU kernel: fused point-target echo accumulation.

The echo hot loop evaluates, for every (pulse, target, sample),

    acc += amp * gate(|t - tau - shift| <= Tp/2) * exp(j*(carrier + pi*K*(t-tau-shift)^2))

The jnp path materializes (pulse_chunk x target_chunk x Ns) f32 temporaries
in HBM between fusion boundaries; this kernel keeps the accumulation in
VMEM: each grid step owns an (Ns_tile x pulse_tile) accumulator pair and
reduces a target chunk with pure VPU math — HBM sees only the
per-(pulse,target) scalars in and the finished tiles out.

Mosaic layout rules shape the design (learned on hardware):
  * dynamic indexing is only legal on sublane-ish dims, never the lane dim —
    so the per-target scalars are laid out (targets, pulses) and each target
    is a (1, pulse_tile) row read;
  * the compute tile is (range, pulse) — fast-time as a column, pulses on
    lanes — so no in-kernel transposes are needed; the final (Ns, P) buffer
    is transposed back to (P, Ns) by XLA once;
  * targets reduce over the *last* grid dimension with output revisiting
    (accumulate into out_ref, zero-init at k==0).

Complex is carried as separate re/im planes (Mosaic has no complex dtype).
Used by ops/echo.py as the ``pallas`` backend; numerically identical to the
jnp backend at f32 rounding (tests/test_pallas.py: interpret mode on CPU;
compiled on TPU by scripts/probe_pallas.py).

Status: validated STUDY, not the default. Measured on hardware (v5e,
512p x 1024tgt x 2048ns): 95.8 ms vs the jnp scan's 75.7 ms, flat across a
(pulse,target,block) tile sweep — the workload is VPU-transcendental-bound
(one sin/cos pair per (pulse,target,sample) either way), so removing the
HBM temporaries that this kernel eliminates does not help; XLA's fused scan
already hits the same VPU ceiling. 'jnp' stays the default direct engine
and the NUFFT 'freq' backend (ops/echo_freq.py, golden-grade) is the fast
path for large scenes — it reduces the transcendental count itself
(O(P*B*W) instead of O(P*B*Ns)), which is the only lever that matters here.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def echo_kernel_body(tau_ref, car_ref, amp_ref, tfast_ref, out_re_ref, out_im_ref,
                 *, k_pi: float, shift: float, half: float,
                 target_tile: int):
    """Accumulate one target chunk into the (Ns_tile, pulse_tile) tile."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_re_ref[:] = jnp.zeros_like(out_re_ref)
        out_im_ref[:] = jnp.zeros_like(out_im_ref)

    t_fast = tfast_ref[:]                        # (Ns_tile, pulse_tile)

    def body(b, carry):
        tau_b = tau_ref[pl.ds(b, 1), :]          # (1, pulse_tile)
        car_b = car_ref[pl.ds(b, 1), :]
        amp_b = amp_ref[pl.ds(b, 1), :]
        arg = (t_fast - tau_b) - shift           # (Ns_tile, pulse_tile)
        gate = jnp.abs(arg) <= half
        phase = car_b + k_pi * (arg * arg)
        a = jnp.where(gate, amp_b, 0.0)
        out_re_ref[:] = out_re_ref[:] + a * jnp.cos(phase)
        out_im_ref[:] = out_im_ref[:] + a * jnp.sin(phase)
        return carry

    # int32 bounds/carry: the package enables x64, and Python-int loop
    # state lowers to i64, which Mosaic cannot legalize
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(target_tile), body,
                      jnp.int32(0))


@partial(jax.jit, static_argnames=("k_pi", "shift", "half", "pulse_tile",
                                   "ns_tile", "target_tile", "interpret"))
def echo_accumulate(tau_rel, carrier, amp, t_fast, *, k_pi: float,
                    shift: float, half: float, pulse_tile: int = 128,
                    ns_tile: int = 512, target_tile: int = 1024,
                    interpret: bool = False):
    """Fused echo accumulation.

    tau_rel, carrier, amp: (P, B) float32 per-(pulse,target) scalars
    t_fast: (Ns,) float32 window-relative fast-time grid
    Returns (P, Ns) complex64.
    """
    num_p, num_b = tau_rel.shape
    ns = t_fast.shape[0]

    pt = min(pulse_tile, max(8, num_p))
    nt = min(ns_tile, max(8, ns))
    tb = min(target_tile, num_b)
    p_pad = -(-num_p // pt) * pt
    ns_pad = -(-ns // nt) * nt
    b_pad = -(-num_b // tb) * tb

    def pad_t(x, fill_edge):
        """(P, B) -> (B_pad, P_pad) transposed + padded."""
        x = jnp.pad(x, [(0, p_pad - num_p), (0, b_pad - num_b)],
                    mode="edge" if fill_edge else "constant")
        return jnp.swapaxes(x, 0, 1)

    tau_t = pad_t(tau_rel, True)
    car_t = pad_t(carrier, True)
    amp_t = pad_t(amp, False)        # zero amp: padded targets contribute 0
    # lane-replicated fast-time column: Mosaic dislikes lane-dim-1 blocks.
    tf_col = jnp.broadcast_to(
        jnp.pad(t_fast, (0, ns_pad - ns), constant_values=-1.0)[:, None],
        (ns_pad, pt))

    grid = (p_pad // pt, ns_pad // nt, b_pad // tb)
    kernel = partial(echo_kernel_body, k_pi=k_pi, shift=shift, half=half,
                     target_tile=tb)
    out_shape = [jax.ShapeDtypeStruct((ns_pad, p_pad), jnp.float32)] * 2

    def call(a1, a2, a3, a4):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, pt), lambda i, j, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, pt), lambda i, j, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, pt), lambda i, j, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, pt), lambda i, j, k: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nt, pt), lambda i, j, k: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, pt), lambda i, j, k: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            interpret=interpret,
        )(a1, a2, a3, a4)

    # Mosaic cannot legalize the i64 grid/loop state that jax_enable_x64
    # injects ("failed to legalize 'func.return' (i32, i64)") — the package
    # enables x64 globally for geometry, so trace the pallas_call with x64
    # OFF. All operands are f32; semantics are unchanged. Root-caused by
    # bisection on the v5e toolchain (x64 off -> compiles and runs at every
    # grid shape; x64 on -> fails even at grid (1,1,1)).
    with jax.enable_x64(False):
        re_t, im_t = jax.jit(call)(tau_t, car_t, amp_t, tf_col)
    raw = jax.lax.complex(jnp.swapaxes(re_t, 0, 1), jnp.swapaxes(im_t, 0, 1))
    return raw[:num_p, :ns]
