"""TPU A/B: two-channel K1 + in-kernel balance (k1_impl='fused2ch') vs the
split path (2x K1 + raw_balance_pallas) on the full kernel-fused GMTI CPI.

Chained-stream protocol (one sync per timed block, ROUND2_NOTES §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nis_sar_amtigmti_video_tpu import config as cfg
from nis_sar_amtigmti_video_tpu.gmti import cfar
from nis_sar_amtigmti_video_tpu.gmti.fused import gmti_cpi_pallas
from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops
from nis_sar_amtigmti_video_tpu.ops.echo import window_start_time

print("device:", jax.devices()[0])
size = int(os.environ.get("SIZE", "4096"))
iters = int(os.environ.get("ITERS", "16"))
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


def run(k1_impl: str, k2_impl: str = "split"):
    def gmti_one(x1r, x1i, x2r, x2i):
        s1r, s1i, s2r, s2i, cal, phase, dmag, det = gmti_cpi_pallas(
            x1r, x1i, x2r, x2i, f, cfar_params=cfar_p, k1_impl=k1_impl,
            k2_impl=k2_impl)
        summary = jnp.sum(phase) + jnp.sum(dmag) + jnp.sum(det.snr) + cal
        return s1r, s1i, s2r, s2i, summary

    fn = jax.jit(gmti_one, donate_argnums=(0, 1, 2, 3))
    key0 = jax.random.PRNGKey(0)
    out = fn(*(jax.random.normal(jax.random.fold_in(key0, i),
                                 (size, size), jnp.float32)
               for i in range(4)))
    s_first = float(out[4])
    t1 = time.perf_counter()
    for _i in range(iters):
        out = fn(out[0], out[1], out[2], out[3])
    s_last = float(out[4])
    ms = 1000.0 * (time.perf_counter() - t1) / iters
    print(f"k1={k1_impl:8s} k2={k2_impl:5s}: {ms:6.2f} ms/CPI -> "
          f"{1000.0 / ms:5.1f} fps"
          f"  (sum first/last {s_first:.4g}/{s_last:.4g})")
    return ms


# interleave A/B/A/B to cancel slow drift on the shared pool
COMBOS = (("split", "split"), ("fused2ch", "split"), ("fused2ch", "pair"))
res = {c: [] for c in COMBOS}
for _rep in range(int(os.environ.get("REPS", "2"))):
    for c in COMBOS:
        res[c].append(run(*c))
for c, ts in res.items():
    print(f"{c}: median {np.median(ts):.2f} ms over {len(ts)} reps")
