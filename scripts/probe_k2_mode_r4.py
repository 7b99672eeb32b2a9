"""Round-4 probe: K2 dot-precision ladder (VERDICT r3 item 2).

K2 is the heaviest GMTI stage (10.9 of 14.5 ms, ROUND3_NOTES §8) and its
bill is the bf16x3 digit dots. Ladder, at the production 4096² CPI:

  bf16x3 — the round-3 default (3 dots per contraction)
  wf16   — tables truncated to bf16, data kept hi+lo (2 dots); the
           operator perturbation is COMMON to both channels, so ATI/DPCA
           should cancel it to first order
  bf16   — single-pass (1 dot), the full-bf16 class

Rows: chained ms/CPI (bench protocol: donated planes, one final sync) and
fidelity vs bf16x3 on one identical random CPI — max |dATI| at strong
pixels (mask 5% of ch1 peak), max intensity ratio dB, DPCA-magnitude
relative delta. Budgets to hold: <1e-3 rad / <0.1 dB (BASELINE).

Run alone on the axon tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu.gmti import cfar
from nis_sar_amtigmti_video_tpu.gmti.fused import gmti_cpi_pallas
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops

print("device:", jax.devices()[0], flush=True)
size = int(os.environ.get("PROBE_SIZE", "4096"))
iters = int(os.environ.get("PROBE_ITERS", "24"))
sc_g = None
from nis_sar_amtigmti_video_tpu import config as cfg  # noqa: E402

scn = cfg.ati_dpca()
r, g = scn.radar, scn.geometry
p = csa_ops.CsaParams(
    wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate, fs_hz=r.fs_hz,
    prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
    range_ref_m=g.slant_range_m,
    t_start_fast=2 * g.slant_range_m / 299792458.0,
    num_pulses=size, num_samples=size)
f = csa_ops.csa_factors(p)
cfar_p = cfar.CfarParams(guard=2, train=8)

key0 = jax.random.PRNGKey(0)
planes0 = tuple(jax.random.normal(jax.random.fold_in(key0, i),
                                  (size, size), jnp.float32)
                for i in range(4))


def make_fn(k2_mode):
    def one(x1r, x1i, x2r, x2i):
        s1r, s1i, s2r, s2i, cal, phase, dmag, det = gmti_cpi_pallas(
            x1r, x1i, x2r, x2i, f, cfar_params=cfar_p, k2_mode=k2_mode)
        summary = jnp.sum(phase) + jnp.sum(dmag) + jnp.sum(det.snr) + cal
        return s1r, s1i, s2r, s2i, summary
    return jax.jit(one, donate_argnums=(0, 1, 2, 3))


def fid_fn(k2_mode):
    def one(x1r, x1i, x2r, x2i):
        s1r, s1i, s2r, s2i, cal, phase, dmag, det = gmti_cpi_pallas(
            x1r, x1i, x2r, x2i, f, cfar_params=cfar_p, k2_mode=k2_mode)
        return s1r, s1i, phase, dmag
    return jax.jit(one)


# fidelity reference (no donation; same input for every mode)
ref = fid_fn(None)(*planes0)
ref = tuple(np.asarray(x) for x in ref)
mag_ref = np.hypot(ref[0], ref[1])
strong = mag_ref > 0.05 * mag_ref.max()
print(f"strong px: {strong.sum()}", flush=True)

for k2_mode in (None, "wf16", "bf16"):
    tag = k2_mode or "bf16x3"
    got = fid_fn(k2_mode)(*planes0)
    got = tuple(np.asarray(x) for x in got)
    mag_g = np.hypot(got[0], got[1])
    d_db = 20 * np.log10(np.maximum(mag_g[strong], 1e-12)
                         / np.maximum(mag_ref[strong], 1e-12))
    dphi = np.angle(np.exp(1j * (got[2][strong] - ref[2][strong])))
    ddm = (np.abs(got[3] - ref[3]).max()
           / max(float(ref[3].max()), 1e-12))
    fn = make_fn(k2_mode)
    out = fn(*(jnp.array(x) for x in planes0))
    _ = float(out[4])
    t1 = time.perf_counter()
    for _i in range(iters):
        out = fn(out[0], out[1], out[2], out[3])
    _ = float(out[4])
    ms = 1000.0 * (time.perf_counter() - t1) / iters
    print(f"{tag:7s}: {ms:6.2f} ms/CPI  |dI| {np.abs(d_db).max():.2e} dB  "
          f"|dATI| {np.abs(dphi).max():.2e} rad  |dDPCA|rel {ddm:.2e}",
          flush=True)
