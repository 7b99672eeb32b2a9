"""Micro-profile of the 4096^2 CSA formation: which stage eats the time.

Run on TPU: python scripts/profile_csa.py [size] [batch]

Finding this encodes: on TPU, jnp.fft along axis=-2 makes XLA pick a
transposed {0,2,1} output layout whose (8,128) tiling pads a small leading
batch dim by up to 64x (OOM at 4k^2 batch 2). Keep FFTs on the last axis
with explicit transposes; reduce in-jit so no eagerly-laid-out temps escape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    sc = cfg.videosar()
    g, r = sc.geometry, sc.radar
    t0 = 2.0 * g.slant_range_m / 299792458.0 - sc.collect.window_length_s / 2
    p = csa_ops.CsaParams(
        wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
        prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
        range_ref_m=g.slant_range_m, t_start_fast=t0,
        num_pulses=size, num_samples=size)
    phases = csa_ops.csa_phases(p)

    @jax.jit
    def mk(key):
        return jax.lax.complex(
            jax.random.normal(key, (batch, size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (batch, size, size), jnp.float32))

    x = mk(jax.random.PRNGKey(0))

    def variant(name, body, iters=8):
        """body: (x, phases) -> same-shaped array. All chaining in one jit."""

        @jax.jit
        def once(v, ph):
            y = body(v, ph)
            return y, jnp.sum(jnp.abs(y[..., :1, :1])).astype(jnp.float32)

        try:
            y, s = once(x, phases)
            _ = float(s)
            t1 = time.perf_counter()
            z = y
            for _ in range(iters):
                z, s = once(z, phases)
            _ = float(s)
            dt = (time.perf_counter() - t1) / (iters * batch)
            print(f"{name:28s}: {dt*1e3:7.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{name:28s}: FAILED {type(e).__name__} {str(e)[:80]}",
                  flush=True)

    sw = lambda v: jnp.swapaxes(v, -1, -2)

    variant("rg fft only", lambda v, ph: jnp.fft.fft(v, axis=-1))
    variant("az fft only (axis=-2)", lambda v, ph: jnp.fft.fft(v, axis=-2))
    variant("az fft via transpose", lambda v, ph: sw(jnp.fft.fft(sw(v), axis=-1)))
    variant("one phase mult", lambda v, ph: v * ph.phi1)
    variant("rg fft+ifft", lambda v, ph: jnp.fft.ifft(jnp.fft.fft(v, axis=-1), axis=-1))
    variant("full csa (current)", lambda v, ph: csa_ops.apply_csa(v, ph))

    def csa_transposed(v, ph):
        s = jnp.fft.fft(sw(v), axis=-1)          # azimuth FFT on last axis
        s = s * sw(ph.phi1)
        s = jnp.fft.fft(sw(s), axis=-1)          # range FFT
        s = s * ph.phi2
        s = jnp.fft.ifft(s, axis=-1)
        s = s * ph.phi3
        s = jnp.fft.ifft(sw(s), axis=-1)         # azimuth IFFT
        return sw(s)

    variant("csa via transposes", csa_transposed)


if __name__ == "__main__" and os.environ.get("PROFILE_WAVE", "1") == "1":
    main()


def main2():
    """Second wave: fused factors + MXU FFT variants."""
    import jax
    import jax.numpy as jnp
    import time as _t

    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
    from nis_sar_amtigmti_video_tpu.ops import fft as mfft

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    sc = cfg.videosar()
    g, r = sc.geometry, sc.radar
    t0 = 2.0 * g.slant_range_m / 299792458.0 - sc.collect.window_length_s / 2
    p = csa_ops.CsaParams(
        wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
        prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
        range_ref_m=g.slant_range_m, t_start_fast=t0,
        num_pulses=size, num_samples=size)
    factors = csa_ops.csa_factors(p)

    @jax.jit
    def mk(key):
        return jax.lax.complex(
            jax.random.normal(key, (batch, size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (batch, size, size), jnp.float32))

    x = mk(jax.random.PRNGKey(0))

    def variant(name, body, iters=8):
        @jax.jit
        def once(v, f):
            y = body(v, f)
            return y, jnp.sum(jnp.abs(y[..., :1, :1])).astype(jnp.float32)
        try:
            y, s = once(x, factors)
            _ = float(s)
            t1 = _t.perf_counter()
            z = y
            for _ in range(iters):
                z, s = once(z, factors)
            _ = float(s)
            dt = (_t.perf_counter() - t1) / (iters * batch)
            print(f"{name:28s}: {dt*1e3:7.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{name:28s}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)

    variant("mxu fft last axis", lambda v, f: mfft.fft(v, axis=-1))
    variant("mxu fft axis -2", lambda v, f: mfft.fft(v, axis=-2))
    variant("csa fused (xla fft)", lambda v, f: csa_ops.apply_csa_fused(v, f))
    variant("csa fused (mxu fft)", lambda v, f: csa_ops.apply_csa_fused(v, f, "mxu"))


if __name__ == "__main__" and os.environ.get("PROFILE_WAVE") == "2":
    main2()
