"""Shared lane-packing helpers for the pallas kernels.

The CSA megakernel, the BP pixel-tile kernel, and the four-step FFT kernel
all carry complex data as f32 re/im planes (Mosaic has no complex dtype)
and contract with (2B, 2B) real block matrices at full 128-lane width.
These precision-critical builders live here once so the bf16x3 splitting
and the [[Mr, +/-Mi], [-/+Mi, Mr]] block layouts cannot drift apart
between kernels.
"""

from __future__ import annotations

import numpy as np


def split_pair(m: np.ndarray):
    """f64/f32 matrix -> (hi, lo) bf16 numpy pair with hi + lo ~= m (f32).

    Mosaic lowers an f32 MXU dot to ONE lossy bf16 pass regardless of the
    requested precision; kernels that need f32-grade accuracy contract with
    both halves (hi@Whi + hi@Wlo + lo@Whi — the manual bf16x3 split,
    measured ~5e-6 relative per dot on v5e)."""
    import ml_dtypes
    m32 = m.astype(np.float32)
    hi = m32.astype(ml_dtypes.bfloat16)
    lo = (m32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def blk_lhs(mat: np.ndarray) -> np.ndarray:
    """Complex matrix as the LHS real block form [[Mr, -Mi], [Mi, Mr]] for
    W @ [re; im]-stacked operands (leading-axis contractions)."""
    top = np.concatenate([mat.real, -mat.imag], axis=1)
    bot = np.concatenate([mat.imag, mat.real], axis=1)
    return np.concatenate([top, bot], axis=0)


def wblk_rhs(mat: np.ndarray) -> np.ndarray:
    """Complex matrix as the RHS real block form [[Mr, Mi], [-Mi, Mr]] for
    operands whose contracted axis carries [re | im] of the digit (stacked
    sublane-side or as minor lane halves)."""
    top = np.concatenate([mat.real, mat.imag], axis=1)
    bot = np.concatenate([-mat.imag, mat.real], axis=1)
    return np.concatenate([top, bot], axis=0)


def roll_half(x):
    """Swap the two minor-axis halves: [re | im] -> [im | re] (the complex
    multiply identity out = s*a + roll_half(s)*b with a = [wr|wr],
    b = [-wi|wi])."""
    import jax.numpy as jnp
    b = x.shape[-1] // 2
    return jnp.concatenate([x[..., b:], x[..., :b]], axis=-1)
