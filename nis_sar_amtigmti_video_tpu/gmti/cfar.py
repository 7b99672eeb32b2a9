"""2-D Cell-Averaging CFAR detection.

The reference has no explicit detector (detection is visual, via the viewers)
but the BASELINE north star names CFAR as a first-class GMTI stage. This is a
standard CA-CFAR over the DPCA magnitude (or ATI-velocity-gated) map,
TPU-shaped: the training-cell mean is two box sums computed with separable
sliding-window reductions — pixel-independent, f32-safe, no gather loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CfarParams:
    guard: int = 2        # guard half-width (cells) per axis
    train: int = 8        # training half-width beyond guard
    pfa: float = 1e-6     # design false-alarm rate (sets the threshold factor)

    @property
    def num_train_cells(self) -> int:
        outer = (2 * (self.guard + self.train) + 1) ** 2
        inner = (2 * self.guard + 1) ** 2
        return outer - inner

    @property
    def alpha(self) -> float:
        """CA-CFAR scale: N*(Pfa^(-1/N) - 1) (exponential clutter)."""
        n = self.num_train_cells
        return n * (self.pfa ** (-1.0 / n) - 1.0)


class CfarResult(NamedTuple):
    detections: jax.Array   # bool map
    snr: jax.Array          # cell power / local noise estimate
    noise: jax.Array        # local noise-power estimate


def _box_sum(x, half: int):
    """Sum over a (2*half+1)^2 window with zero padding, via two separable
    sliding-window reductions.

    Precision note: SAR power maps span 80-100 dB, so the cumsum-difference
    box filter is unusable in f32 — after one bright scatterer the running
    sum is O(target power) and differencing it for weak cells far away loses
    their entire training sum. Locally-windowed sums never difference large
    accumulators (each output sums only 2*half+1 values), so f32 keeps
    relative error ~2^-24 of the *local* sum — and f32 is what TPU v5e wants:
    the f64-cumsum variant doubled the full-GMTI-step latency (emulated f64)."""
    k = 2 * half + 1
    nb = x.ndim - 2
    win = (1,) * nb + (k, 1)
    pad = [(0, 0)] * nb + [(half, half), (0, 0)]

    zero = jnp.zeros((), x.dtype)
    y = jax.lax.reduce_window(x, zero, jax.lax.add, win, (1,) * x.ndim, pad)
    win2 = (1,) * nb + (1, k)
    pad2 = [(0, 0)] * nb + [(0, 0), (half, half)]
    return jax.lax.reduce_window(y, zero, jax.lax.add, win2, (1,) * x.ndim,
                                 pad2)


def _count_1d(n: int, half: int):
    """Per-position count of in-bounds cells in a (2*half+1) window — the
    1-D factor of the zero-padded box count (exact small integers)."""
    i = jnp.arange(n)
    return (jnp.minimum(i + half, n - 1)
            - jnp.maximum(i - half, 0) + 1).astype(jnp.float32)


def _box_count(shape2, half: int):
    """Rank-1 analytic equivalent of ``_box_sum(ones, half)``: the 2-D count
    is separable, count[i, j] = c_h(i) * c_w(j), and both factors are exact
    integers in f32 — bit-identical to the reduce_window result at ~0 HBM
    cost (two 1-D vectors instead of four full-image window passes)."""
    h, w = shape2
    return _count_1d(h, half)[:, None] * _count_1d(w, half)[None, :]


@partial(jax.jit, static_argnames=("p",))
def ca_cfar(power, p: CfarParams) -> CfarResult:
    """Detect cells whose power exceeds alpha * local-training-mean.

    power: (..., H, W) real nonnegative (e.g. |dpca|^2).
    Edge cells use the available (zero-padded) training cells with the count
    corrected, so sensitivity degrades gracefully at borders.
    """
    g, t = p.guard, p.train
    outer = _box_sum(power, g + t)
    inner = _box_sum(power, g)
    n_outer = _box_count(power.shape[-2:], g + t)
    n_inner = _box_count(power.shape[-2:], g)
    n_train = jnp.maximum(n_outer - n_inner, 1.0)
    noise = (outer - inner) / n_train
    snr = power / jnp.maximum(noise, 1e-30)
    return CfarResult(detections=snr > p.alpha, snr=snr, noise=noise)


def detection_list(result: CfarResult, max_detections: int = 256):
    """Top-k detections as (row, col, snr) arrays, fixed-size (padded with
    -1 rows) so the output shape is static under jit.

    Batched (..., H, W) inputs return (..., K) arrays with the top-k taken
    *per image* (not across the batch)."""
    snr = jnp.where(result.detections, result.snr, 0.0)
    h, w = snr.shape[-2], snr.shape[-1]
    flat = snr.reshape(snr.shape[:-2] + (h * w,))
    vals, idx = jax.lax.top_k(flat, max_detections)
    rows, cols = idx // w, idx % w
    valid = vals > 0
    return (jnp.where(valid, rows, -1), jnp.where(valid, cols, -1),
            jnp.where(valid, vals, 0.0))
