"""Round-4 probe: full-scale (7,199 x 13,200) CSA on TPU, FFT impl A/B.

The e2e full-scale GMTI run spends ~2.7 s in focus_and_products —
dominated by jnp.fft at the non-pow2 reference lengths (7,199 = 23*313
after the DPCA shift, 13,200 = 120*110). With ops/fft.py generalized to
composite four-step factorizations, time one full-scale channel focus per
impl plus the two-channel product step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops

print("device:", jax.devices()[0], flush=True)
sc = cfg.ati_dpca()
rs, gs, cs = sc.radar, sc.geometry, sc.collect
n_p = cs.num_pulses(rs.prf_hz) - 1          # DPCA pulse shift
n_s = cs.num_samples(rs.fs_hz)
print("shape:", (n_p, n_s), flush=True)

p = csa_ops.CsaParams(
    wavelength_m=rs.wavelength_m, chirp_rate=rs.chirp_rate, fs_hz=rs.fs_hz,
    prf_hz=rs.prf_hz, velocity_mps=gs.effective_velocity_mps,
    range_ref_m=gs.slant_range_m, t_start_fast=2.0 * gs.slant_range_m / 3e8,
    num_pulses=n_p, num_samples=n_s)
f = csa_ops.csa_factors(p)

# build the raw input ON DEVICE: big host->device complex uploads are not
# supported through the axon relay
key = jax.random.PRNGKey(0)
raw = jax.lax.complex(
    jax.random.normal(key, (n_p, n_s), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1), (n_p, n_s), jnp.float32))
raw = jax.block_until_ready(raw)


def stream(fn, n=2):
    out = fn(raw)
    _ = float(jnp.sum(jnp.abs(out[:4, :4])))
    t1 = time.perf_counter()
    for _i in range(n):
        out = fn(raw)
    _ = float(jnp.sum(jnp.abs(out[:4, :4])))
    return (time.perf_counter() - t1) / n


ref = None
for tag, fn in (
        ("fused hybrid ", jax.jit(lambda v: csa_ops.apply_csa_fused(
            v, f, "hybrid"))),
        ("fused mxu    ", jax.jit(lambda v: csa_ops.apply_csa_fused(
            v, f, "mxu"))),
        ("fused_t      ", jax.jit(lambda v: csa_ops.apply_csa_fused_t(
            v, f))),
        ("fused xla    ", jax.jit(lambda v: csa_ops.apply_csa_fused(
            v, f, "xla")))):
    try:
        dt = stream(fn)
        out = fn(raw)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out - ref))
                        / jnp.max(jnp.abs(ref)))
        print(f"{tag}: {dt:7.3f} s   rel-err vs first: {err:.2e}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
