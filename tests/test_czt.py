"""Chirp-Z trig-interpolant evaluation (ops/czt.py) vs the exact DFT sum."""

import jax.numpy as jnp
import numpy as np
import pytest

from nis_sar_amtigmti_video_tpu.ops.czt import czt_eval


def _bandlimited(n, seed=0, frac=3):
    rng = np.random.default_rng(seed)
    spec = np.zeros(n, np.complex128)
    lo = n // frac
    spec[:lo] = rng.standard_normal(lo) + 1j * rng.standard_normal(lo)
    spec[-lo:] = rng.standard_normal(lo) + 1j * rng.standard_normal(lo)
    return np.fft.ifft(spec)


def _truth(x, u):
    n = x.shape[0]
    m = np.fft.fftfreq(n) * n
    X = np.fft.fft(x)
    return (X[None, :] * np.exp(2j * np.pi * m[None, :] * u[:, None] / n)
            ).sum(axis=1) / n


@pytest.mark.parametrize("step,start,n_out", [
    (1.0, 0.0, 96),          # identity
    (0.37, 3.2, 41),         # dense zoom
    (1.73, -2.5, 200),       # sparse + out-of-range start, n_out > n
    (0.8333333, 10.0, 96),   # the fast-BP output-resample regime
])
def test_matches_exact_dft_sum(step, start, n_out):
    x = _bandlimited(96)
    got = np.asarray(czt_eval(jnp.asarray(x.astype(np.complex64)),
                              n_out, step, start))
    want = _truth(x, start + step * np.arange(n_out))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_batched_and_axis():
    x = _bandlimited(96).astype(np.complex64)
    xb = np.stack([x, 2 * x])
    g = np.asarray(czt_eval(jnp.asarray(xb), 41, 0.37, 3.2, axis=-1))
    assert np.abs(g[1] - 2 * g[0]).max() < 1e-4
    g_t = np.asarray(czt_eval(jnp.asarray(xb.T), 41, 0.37, 3.2, axis=0))
    assert np.abs(g_t[:, 1] - g[1]).max() < 1e-5


def test_integer_positions_return_samples():
    x = _bandlimited(128).astype(np.complex64)
    got = np.asarray(czt_eval(jnp.asarray(x), 64, 2.0, 1.0))
    assert np.abs(got - x[1:128:2]).max() < 1e-5


def test_large_upsample_ratio_no_alias():
    """n_out >> n: positive Bluestein lags beyond nfft/2 aliased before the
    2*n_out bound was added (code-review finding: n=32, n_out=300 gave O(1)
    errors from k=257)."""
    rng = np.random.default_rng(5)
    n, n_out, step, start = 32, 300, 0.1, 0.0
    x = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n),
                    jnp.complex64)
    got = np.asarray(czt_eval(x, n_out, step, start))
    xf = np.fft.fft(np.asarray(x)) / n
    f = np.fft.fftfreq(n)
    pos = start + step * np.arange(n_out)
    want = (xf[None, :] * np.exp(2j * np.pi * f[None, :] * pos[:, None])
            ).sum(axis=1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-5, err
