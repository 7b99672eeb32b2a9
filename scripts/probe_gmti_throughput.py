"""TPU: GMTI throughput — batched 2-channel CPIs, chained (streaming)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.gmti import ati, cfar, dpca
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

print("device:", jax.devices()[0])
size = 4096
ncpi = int(os.environ.get("NCPI", "2"))      # CPIs per dispatch
impl = os.environ.get("IMPL", "hybrid")
sc = cfg.videosar()
g, r = sc.geometry, sc.radar
t0 = window_start_time(g.slant_range_m, None, sc.collect.window_length_s,
                       "centered")
p = csa_ops.CsaParams(
    wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
    prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
    range_ref_m=g.slant_range_m, t_start_fast=t0,
    num_pulses=size, num_samples=size)
f = csa_ops.csa_factors(p)
cfar_p = cfar.CfarParams(guard=2, train=8)


@jax.jit
def mk(key):
    return jax.lax.complex(
        jax.random.normal(key, (ncpi, 2, size, size), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (ncpi, 2, size, size), jnp.float32))


from nis_sar_amtigmti_video_tpu.gmti.fused import (gmti_cpi_pallas,
                                                   gmti_product_step)
from nis_sar_amtigmti_video_tpu.ops.pallas import csa_kernel

use_fused_prods = os.environ.get("FUSED_PRODS", "1") == "1"
use_kernel = os.environ.get("KERNEL_PRODS", "0") == "1"


def gmti_batch(xr, xi):
    """(ncpi, 2, N, N) raw planes -> product summaries + next planes."""
    if use_kernel:
        def cpi(xr_, xi_):
            s1r, s1i, s2r, s2i, _, ph, dm, det = gmti_cpi_pallas(
                xr_[0], xi_[0], xr_[1], xi_[1], f, cfar_params=cfar_p)
            return (jnp.stack([s1r, s2r]), jnp.stack([s1i, s2i]),
                    ph, dm, det.snr)

        sr, si, ph, dm, snr = jax.vmap(cpi)(xr, xi)
        return (sr, si, jnp.sum(ph[:, :1, :1]) + jnp.sum(dm[:, :1, :1])
                + jnp.sum(snr[:, :1, :1]))
    if impl == "pallas":
        sr, si = csa_kernel.apply_csa_pallas_planes(
            xr.reshape(-1, size, size), xi.reshape(-1, size, size), f)
        slc = jax.lax.complex(sr.reshape(ncpi, 2, size, size),
                              si.reshape(ncpi, 2, size, size))
    else:
        slc = csa_ops.apply_csa_fused(
            jax.lax.complex(xr, xi).reshape(-1, size, size), f, impl)
        slc = slc.reshape(ncpi, 2, size, size)

    def prods(s):
        s1, s2 = s[0], s[1]
        if use_fused_prods:
            _, phase, dmag, det = gmti_product_step(s1, s2,
                                                    cfar_params=cfar_p)
            return phase, dmag, det.snr
        s2 = ati.apply_balance(s2, ati.channel_balance_phase(s1, s2))
        phase = ati.masked_phase(s1, s2)
        diff = dpca.dpca_difference(s1, s2)
        det = cfar.ca_cfar(jnp.abs(diff) ** 2, cfar_p)
        return phase, jnp.abs(diff), det.snr

    ph, dm, snr = jax.vmap(prods)(slc)
    # chain on the SLC planes so the stream stays on device
    return (jnp.real(slc), jnp.imag(slc),
            jnp.sum(ph[:, :1, :1]) + jnp.sum(dm[:, :1, :1])
            + jnp.sum(snr[:, :1, :1]))


fn = jax.jit(gmti_batch, donate_argnums=(0, 1))
x0 = mk(jax.random.PRNGKey(0))
xr, xi = jnp.real(x0), jnp.imag(x0)
t1 = time.perf_counter()
xr, xi, s = fn(xr, xi)
_ = float(s)
print(f"compile+first: {time.perf_counter() - t1:.1f} s")
iters = 8
t1 = time.perf_counter()
for _i in range(iters):
    xr, xi, s = fn(xr, xi)
_ = float(s)                      # ONE sync: amortizes the ~33 ms tunnel RTT
dt = time.perf_counter() - t1
ms = 1000.0 * dt / (iters * ncpi)
print(f"gmti[{impl}, fused_prods={use_fused_prods}] streaming: "
      f"{ms:.2f} ms/CPI -> {1000.0 / ms:.1f} fps "
      f"({ncpi} CPIs/dispatch, {iters} chained, 1 sync)")
