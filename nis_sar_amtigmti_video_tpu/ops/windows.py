"""Window/taper functions (device-side, float32 by default).

The reference tapers with scipy's symmetric Hamming
(``sar_satellite_sim.py:382,396``); these reproduce it exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def hamming(n: int, dtype=jnp.float32):
    """Symmetric Hamming window (scipy.signal.windows.hamming, sym=True)."""
    if n == 1:
        return jnp.ones((1,), dtype)
    m = jnp.arange(n, dtype=jnp.float64)
    return (0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * m / (n - 1))).astype(dtype)


def hann(n: int, dtype=jnp.float32):
    if n == 1:
        return jnp.ones((1,), dtype)
    m = jnp.arange(n, dtype=jnp.float64)
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * m / (n - 1))).astype(dtype)


def rectangular(n: int, dtype=jnp.float32):
    return jnp.ones((n,), dtype)


def taylor(n: int, nbar: int = 4, sll_db: float = -30.0, dtype=jnp.float32):
    """Taylor taper — the standard SAR sidelobe-control window (not in the
    reference, provided for production imaging)."""
    import numpy as np

    a = np.arccosh(10.0 ** (-sll_db / 20.0)) / np.pi
    sigma2 = nbar ** 2 / (a ** 2 + (nbar - 0.5) ** 2)
    m = np.arange(1, nbar)
    fm = np.empty(nbar - 1)
    for i, mi in enumerate(m):
        num = np.prod(1.0 - mi ** 2 / (sigma2 * (a ** 2 + (m - 0.5) ** 2)))
        den = np.prod([1.0 - mi ** 2 / j ** 2 for j in m if j != mi])
        fm[i] = (-1.0) ** (mi + 1) * num / (2.0 * den)
    x = (np.arange(n) - (n - 1) / 2.0) / n
    w = 1.0 + 2.0 * np.sum(fm[:, None] * np.cos(2.0 * np.pi * m[:, None] * x[None, :]),
                           axis=0)
    return jnp.asarray(w / w.max(), dtype)


WINDOWS = {
    "hamming": hamming,
    "hann": hann,
    "rect": rectangular,
    "rectangular": rectangular,
    "taylor": taylor,
    "none": rectangular,
}


def get_window(name: str, n: int, dtype=jnp.float32):
    try:
        return WINDOWS[name](n, dtype=dtype)
    except KeyError:
        raise ValueError(f"unknown window {name!r}; options: {sorted(WINDOWS)}")
