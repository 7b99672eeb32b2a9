"""Pallas TPU kernel: fused point-target echo accumulation.

The echo hot loop evaluates, for every (pulse, target, sample),

    acc += amp * gate(|t - tau - shift| <= Tp/2) * exp(j*(carrier + pi*K*(t-tau-shift)^2))

The jnp path materializes (pulse_chunk x target_chunk x Ns) f32 temporaries
in HBM between fusion boundaries; this kernel keeps the whole accumulation
in VMEM: each grid step owns a (pulse_tile x Ns) accumulator pair and loops
targets with pure VPU math — HBM sees only the per-(pulse,target) scalars in
and the finished pulse rows out.

Complex is carried as separate re/im planes (Mosaic has no complex dtype).
Used by ops/echo.py as the ``pallas`` backend; numerically identical to the
jnp backend at f32 rounding (tested in tests/test_pallas.py, interpret mode
on CPU + compiled on TPU).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _echo_kernel(tau_ref, car_ref, amp_ref, tfast_ref, out_re_ref, out_im_ref,
                 *, k_pi: float, shift: float, half: float, num_targets: int):
    """One pulse-tile: accumulate all targets into the (PT, Ns) tile."""
    t_fast = tfast_ref[:]                       # (1, Ns)

    def body(b, acc):
        acc_re, acc_im = acc
        tau_b = tau_ref[:, b][:, None]          # (PT, 1)
        car_b = car_ref[:, b][:, None]
        amp_b = amp_ref[:, b][:, None]
        arg = (t_fast - tau_b) - shift          # (PT, Ns)
        gate = jnp.abs(arg) <= half
        phase = car_b + k_pi * (arg * arg)
        a = jnp.where(gate, amp_b, 0.0)
        return (acc_re + a * jnp.cos(phase), acc_im + a * jnp.sin(phase))

    zero = jnp.zeros(out_re_ref.shape, jnp.float32)
    acc_re, acc_im = jax.lax.fori_loop(0, num_targets, body, (zero, zero))
    out_re_ref[:] = acc_re
    out_im_ref[:] = acc_im


@partial(jax.jit, static_argnames=("k_pi", "shift", "half", "pulse_tile",
                                   "interpret"))
def echo_accumulate(tau_rel, carrier, amp, t_fast, *, k_pi: float,
                    shift: float, half: float, pulse_tile: int = 8,
                    interpret: bool = False):
    """Fused echo accumulation.

    tau_rel, carrier, amp: (P, B) float32 per-(pulse,target) scalars
    t_fast: (Ns,) float32 window-relative fast-time grid
    Returns (P, Ns) complex64.
    """
    num_p, num_b = tau_rel.shape
    ns = t_fast.shape[0]
    pt = max(1, min(pulse_tile, num_p))
    p_pad = -(-num_p // pt) * pt
    if p_pad != num_p:
        pad = [(0, p_pad - num_p), (0, 0)]
        tau_rel = jnp.pad(tau_rel, pad, mode="edge")
        carrier = jnp.pad(carrier, pad, mode="edge")
        amp = jnp.pad(amp, pad)              # zero amp: no contribution

    grid = (p_pad // pt,)
    kernel = partial(_echo_kernel, k_pi=k_pi, shift=shift, half=half,
                     num_targets=num_b)
    out_shape = [jax.ShapeDtypeStruct((p_pad, ns), jnp.float32)] * 2
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pt, num_b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, num_b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, num_b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((pt, ns), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, ns), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(tau_rel, carrier, amp, t_fast[None, :])
    return jax.lax.complex(re[:num_p], im[:num_p])
